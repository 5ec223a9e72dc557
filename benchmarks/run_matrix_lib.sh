# Shared helper for the resumable measurement matrices (sourced by
# matrix_r2.sh / matrix_r2b.sh).  Protocol: each entry logs to
# $OUT/<name>.log and writes $OUT/<name>.done on rc=0; entries with a
# non-empty .done are skipped, so an interrupted matrix resumes where it
# stopped.  One entry at a time — the tunneled chip is single-tenant.
run() {  # run <name> <env...> -- <cmd...>
    local name="$1"; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    if [ -s "$OUT/$name.done" ]; then echo "=== $name (cached)"; return; fi
    echo "=== $name ==="
    env "${envs[@]}" timeout "${TMO:-3600}" "$@" >"$OUT/$name.log" 2>&1
    local rc=$?
    echo "--- $name: rc=$rc $(tail -1 "$OUT/$name.log")"
    [ $rc -eq 0 ] && echo ok >"$OUT/$name.done"
}
