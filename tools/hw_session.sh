#!/bin/bash
# One-command hardware validation + bench pass (run when the TPU tunnel is up).
#
# Order: bounded probe -> kernel validation -> driver bench -> exact-mode
# roofline + conv micro-breakdown (flat-batching A/B data) -> serving burst
# (pipelined + buckets) -> Poisson soak -> streaming benches (unity + exact
# EQ, dynamic vs per-n0).  Each step logs to /tmp/hw_<step>.log and the
# script stops early if the probe fails.  The serving steps carry a stall
# watchdog (utils/watchdog) so a mid-run tunnel outage aborts in ~10 min
# with a thread dump instead of eating the step timeout (observed round-4
# session 3).
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
# per-stage exact-mode roofline (PERF.md) + the conv micro-breakdown — both
# re-measure the flat-batching (custom_vmap *_rows) change vs the session-2
# rank-3 numbers (conv 449.7 ms, fwd_kernels 197.1 vs flat 142.1)
# BENCH_ITERS=7: round-4 left the exact-air stage number noisy at 3 iters
# (305 ms avg / 275 min vs the 228 ms FFT unit) — settle it (VERDICT item 7)
run profile_exact 7200 env BENCH_ITERS=7 python tools/profile_exact.py
run profile_conv 3600 python tools/profile_conv.py
run bench_serving 3600 python tools/bench_serving.py
# host-side codec throughput table (no TPU, but it needs the idle host this
# sequenced session guarantees — a concurrent suite read 2-25x low)
run codecs 3600 python tools/bench_codecs.py
# 30-min Poisson soak, mixed lengths/metrics/EQ + external-IR jobs, with
# the memory-accounting curve (round-4 VERDICT item 1: prove the RSS
# plateau); warmup compiles the signature set first — slow on a cold
# cache (raise --stall-timeout there)
run soak 5400 python tools/bench_serving.py --soak 1800 --arrival-rate 2.0 \
    --extir-every 5
# service-config matrix arms under load (round-4 VERDICT item 5): the
# pallas-backend arm measured on chip; mesh arms auto-skip on one device
run soak_matrix 5400 python tools/bench_serving.py --matrix --soak 240 \
    --arrival-rate 2.0
# sustained load THROUGH the HTTP layer with real mixed-codec uploads
# (round-4 VERDICT item 3): request-thread decode vs the dispatch loop
run http_soak 3600 python tools/bench_serving.py --http --soak 600 \
    --arrival-rate 1.0
run long_unity 5400 python tools/bench_long.py long --minutes 30
run long_eq 5400 python tools/bench_long.py long --minutes 30 --bass 1.6 --treble 0.7
# A/B: the default is now the traced-n0 padded-grid EQ (round-4 on-chip
# measurement — see BENCH_HISTORY); this arm re-measures the legacy
# per-n0 exact executables so a regression in either path is visible.
run long_eq_static 5400 env ARS_STREAM_EQ_DYNAMIC=0 \
    python tools/bench_long.py long --minutes 30 --bass 1.6 --treble 0.7
# round-5: the exact-length streaming air transform (fast_filters=False) —
# the on-chip cost of bit-honest streaming semantics vs the conv-grid arm
run long_exact_air 5400 python tools/bench_long.py long --minutes 30 --exact
echo "== done — record the numbers in BENCH_HISTORY.md =="
