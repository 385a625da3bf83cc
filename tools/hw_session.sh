#!/bin/bash
# One-command hardware validation + bench pass (run when the TPU tunnel is up).
#
# Order: bounded probe -> kernel validation -> driver bench -> streaming
# benches (unity + exact EQ) -> EQ-barrier A/B.  Each step logs to
# /tmp/hw_<step>.log and the script stops early if the probe fails.
# REQUIREMENTS (CLAUDE.md): idle host (no concurrent CPU suite), exactly one
# TPU process at a time — this script runs its steps strictly sequentially.
cd /root/repo || exit 1

echo "== probe =="
if ! timeout 120 python -u -c "import os; os.chdir('/root/repo'); import jax; print(jax.devices())"; then
    echo "TPU tunnel DOWN (probe hung >120s) — aborting hardware session"
    exit 1
fi

set -o pipefail
run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 to=$2; shift 2
    echo "== $name (timeout ${to}s) =="
    timeout "$to" "$@" 2>&1 | tee "/tmp/hw_${name}.log" | tail -20
    echo "-- $name rc=$? --"
}

run validate 1800 python tools/tpu_validate.py
run bench 3600 python bench.py
# per-stage exact-mode roofline (round-4 VERDICT item 6) → PERF.md data
run profile_exact 5400 python tools/profile_exact.py
run bench_serving 3600 python tools/bench_serving.py
# 10-min Poisson soak, mixed lengths/metrics/EQ (round-4 VERDICT item 3);
# warmup compiles up to 12 signatures first — slow on a cold cache
run soak 5400 python tools/bench_serving.py --soak 600 --arrival-rate 2.0
run long_unity 5400 python tools/bench_long.py long --minutes 30
run long_eq 5400 python tools/bench_long.py long --minutes 30 --bass 1.6 --treble 0.7
# A/B: the default is now the traced-n0 padded-grid EQ (round-4 on-chip
# measurement — see BENCH_HISTORY); this arm re-measures the legacy
# per-n0 exact executables so a regression in either path is visible.
run long_eq_static 5400 env ARS_STREAM_EQ_DYNAMIC=0 \
    python tools/bench_long.py long --minutes 30 --bass 1.6 --treble 0.7
run eq_barrier 5400 python tools/measure_eq_barrier.py --minutes 30
echo "== done — record the numbers in BENCH_HISTORY.md =="
