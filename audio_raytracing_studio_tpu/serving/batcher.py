"""Dynamic micro-batching render service — the TPU serving core.

One render request at a time leaves the MXU mostly idle: the measured
single-chip throughput (bench.py, BENCH_HISTORY) comes from batched SPMD
renders, not from per-request graphs.  ``RenderService`` is the serving-side
answer, the standard TPU inference-serving shape (queue → shape-bucket →
micro-batch → dispatch) applied to audio renders:

* Concurrent ``RenderJob``s enter one queue.
* A worker thread groups them by **batch key** — everything that determines
  the compiled XLA program: sample rate, half-second length bucket
  (``parallel.sharding.bucket_length``), IR geometry (hall type, room size,
  z position), target layout, filter mode, metrics flag.  Value-only
  parameters (material, diffusion, air, positions, mix, EQ gains, seeds)
  sweep freely **inside** one batch — ``render_batch`` widens their stage
  flags batch-wide and keeps per-clip semantics through traced scalars.
* A group dispatches as ONE ``parallel.sharding.render_batch`` call when it
  reaches ``max_batch`` or its oldest job has waited ``max_wait_ms``.
  Jobs arriving while the device renders batch *i* accumulate into batch
  *i+1* — batch size adapts to load with no extra tuning.
* Dispatch is PIPELINED (``pipeline_depth``): the worker stacks, uploads
  and launches batch *i+1* while a completer thread downloads and trims
  batch *i* (``render_batch(async_results=True)``).  On the axon tunnel
  the sustained soak measured 8.4× realtime against a 34× burst —
  the gap is serialized host↔device transfer work, the same insight that
  made ``parallel.streaming`` slab-pipelined.  A bounded hand-off queue
  keeps at most ``pipeline_depth`` groups' device results live.
* Each job's output is trimmed back to its true span
  (``clip_len + ir_len − 1``) and, with metrics on, metered ON DEVICE
  against the true span (masked meter), never the bucket padding.

Padding semantics: zero-padding a clip to its length bucket is exact for
every linear-convolution stage, and the exact air filter's smooth gain
ramp is padding-insensitive (measured ~4e-7 at half-second granularity).
The circular shelf EQ is NOT: its brick-wall masks have sinc-like time
tails, so padded-length EQ deviates 1e-2-class from the clip's
true-length EQ even at half-second padding (found by
tools/fuzz_campaign.py batch mode).  ``render_batch`` therefore runs the
EQ **length-dynamically** for padded EQ-on clips — chirps and gain derive
on device from each clip's true length as traced scalars
(ops.filters.apply_shelf_eq_dynamic, ≤1e-6 vs the unpadded solo render) —
so EQ jobs bucket to the same half-second grid as everything else: one
executable per bucket for ANY clip length, arbitrary-length EQ uploads
cannot grow the compile set (the round-3 exact-length grouping traded
that for per-length compiles, an unbounded-compile DoS surface).

The reference has no counterpart (SURVEY §2.7: no parallelism of any kind —
one synchronous NumPy pass per Gradio click, raytracer_studio.py:1326-1330).
"""

from __future__ import annotations

import dataclasses
import hashlib
import logging
import queue
import threading
import time
import uuid
import weakref
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..params import RenderParams

log = logging.getLogger("ars_tpu.serving")

_STOP = object()


@dataclasses.dataclass
class RenderJob:
    """One render request: a clip plus the 16-parameter surface."""

    audio: np.ndarray  # (N,) or (N, C) float32
    rate: int
    params: RenderParams = dataclasses.field(default_factory=RenderParams)
    seed: int = 0
    with_metrics: bool = False
    external_ir: Optional[np.ndarray] = None  # (L, 2) when use_external_ir
    external_ir_rate: Optional[int] = None


@dataclasses.dataclass
class RenderResult:
    """Trimmed render output (true span ``clip_len + ir_len − 1``)."""

    audio: np.ndarray  # (len_out, channels) float32 (int16 when pcm16)
    rate: int
    metrics: Optional[dict] = None  # lufs / true_peak_dbfs / rms_dbfs


@dataclasses.dataclass
class _Item:
    job: RenderJob
    future: Future
    key: tuple
    clip: np.ndarray  # stereo-ized, (n_true, 2) float32
    n_bucket: int
    prepared_ir: Optional[np.ndarray]  # rate-matched (L, 2), external mode
    nbytes: int = 0  # host bytes this item holds until its future resolves


def _untrack_result(svc_ref, nbytes: int):
    """weakref.finalize callback: a RenderResult's audio array was GC'd.

    Module-level + weakref-to-service so the finalizer chain never keeps a
    stopped RenderService alive through its outstanding results.
    """
    svc = svc_ref()
    if svc is not None:
        with svc._lock:
            svc._retained_result_bytes -= nbytes
            svc._retained_results -= 1


def memory_stats() -> Dict[str, Any]:
    """Process/runtime memory snapshot, merged into ``stats()``.

    ``rss_mb`` is the whole process; ``executables`` counts compiled XLA
    programs cached across the render path's jit entry points (each holds
    host-side buffers the allocator never shows per-owner); ``device_buffer_mb``
    sums live jax array bytes (HBM on TPU).  Soak harnesses diff these
    against RSS to attribute growth (VERDICT r4 item 1).
    """
    out: Dict[str, Any] = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    out["rss_mb"] = round(float(line.split()[1]) / 1024.0, 1)
                    break
    except OSError:
        pass
    try:
        from ..parallel.sharding import executable_cache_size

        out["executables"] = executable_cache_size()
    except Exception:  # noqa: BLE001 — accounting must never break serving
        pass
    try:
        import jax

        out["device_buffer_mb"] = round(
            sum(x.nbytes for x in jax.live_arrays()) / 1e6, 1
        )
    except Exception:  # noqa: BLE001
        pass
    return out


class RenderService:
    """Queue + micro-batcher over ``parallel.sharding.render_batch``.

    Parameters
    ----------
    max_batch:    dispatch a group as soon as it holds this many jobs.
                  Groups are zero-padded up to power-of-two size buckets
                  capped at max_batch (see ``_batch_pad``) so the compiled
                  executable set stays O(log max_batch) whatever sizes
                  arrival timing produces; pad rows never download.
    max_wait_ms:  dispatch a partial group once its oldest job has waited
                  this long (latency bound under light load).
    device_mesh:  optional ``jax.sharding.Mesh`` — the padded batch also
                  rounds up to a multiple of the data axis.
    ir_backend:   "jnp" or "pallas" (the fused RIR-bank kernel).
    fast_filters: conv-grid air absorption (≤2e-4 deviation) instead of the
                  reference's exact-length transform.
    pcm16_output: quantize to int16 on device (halves the result transfer).
    streaming_threshold_s: clips longer than this route to the
                  bounded-memory streaming renderer (parallel.streaming)
                  as singleton jobs instead of the whole-signal batched
                  path — an hour-scale upload must not attempt one giant
                  FFT (the single-shot exact path tops out around ~10 min
                  of 48 kHz audio on a 16 GB chip).  None disables.
                  ``fast_filters`` is honored end to end: routed jobs run
                  the exact-length air transform when the service is
                  configured exact (the jnp IR backend's seed stream is
                  shared by both backends, so routing changes nothing
                  else).
    chunk_seconds: streaming chunk size for routed long jobs.
    max_queued:   submit() raises RuntimeError once this many jobs are
                  waiting (backpressure — each queued job holds its whole
                  decoded clip in host RAM; HTTP maps this to 503).
    pipeline_depth: number of dispatched groups in flight at once.  2 (the
                  default) overlaps group *i*'s result download/trim with
                  group *i+1*'s host-stack/upload/compute on a completer
                  thread; 1 restores the fully serial worker.  Each
                  in-flight group holds its device result buffers until
                  its download completes, so depth bounds HBM use.
    start:        spawn the worker immediately (tests pass False to stage
                  jobs deterministically before the first dispatch).
    """

    def __init__(
        self,
        *,
        max_batch: int = 16,
        max_wait_ms: float = 100.0,
        device_mesh=None,
        ir_backend: str = "jnp",
        fast_filters: bool = False,
        pcm16_output: bool = False,
        streaming_threshold_s: Optional[float] = 600.0,
        chunk_seconds: float = 30.0,
        max_queued: int = 64,
        pipeline_depth: int = 2,
        start: bool = True,
    ):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1 (got {max_batch})")
        if max_queued < 1:
            raise ValueError(f"max_queued must be >= 1 (got {max_queued})")
        if pipeline_depth < 1:
            raise ValueError(
                f"pipeline_depth must be >= 1 (got {pipeline_depth})"
            )
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.device_mesh = device_mesh
        self.ir_backend = ir_backend
        self.fast_filters = bool(fast_filters)
        self.pcm16_output = bool(pcm16_output)
        self.streaming_threshold_s = streaming_threshold_s
        self.chunk_seconds = float(chunk_seconds)
        self.max_queued = int(max_queued)
        self.pipeline_depth = int(pipeline_depth)
        self._q: "queue.Queue" = queue.Queue()
        # dispatched-but-not-downloaded groups; the bounded put() is the
        # worker's backpressure against the completer falling behind
        self._cq: Optional["queue.Queue"] = (
            queue.Queue(maxsize=self.pipeline_depth - 1)
            if self.pipeline_depth > 1
            else None
        )
        self._lock = threading.Lock()
        self._batch_sizes: List[int] = []
        self._jobs_done = 0
        self._jobs_failed = 0
        self._dispatch_s = 0.0  # host-stack + upload + launch time
        self._fetch_s = 0.0  # result download + host conversion time
        # host-memory accounting (round-4 VERDICT item 1: the serving
        # layer must be able to say where its bytes are)
        self._inflight_input_bytes = 0  # clips+IRs of unresolved jobs
        self._retained_result_bytes = 0  # result arrays callers still hold
        self._retained_results = 0
        # cumulative transfer volume: on the axon backend every
        # host↔device byte is leaked host-side by the plugin
        # (tools/diag_transfer_rss.py), so these counters are the restart
        # signal for long-lived chip services — RSS growth tracks them 1:1
        self._dispatched_input_bytes_total = 0
        self._fetched_result_bytes_total = 0
        self._stopped = False
        self._thread: Optional[threading.Thread] = None
        self._completer: Optional[threading.Thread] = None
        if start:
            self.start()

    # --- lifecycle ---
    def start(self) -> "RenderService":
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(
                target=self._worker, name="ars-serving-batcher", daemon=True
            )
            self._thread.start()
        if self._cq is not None and (
            self._completer is None or not self._completer.is_alive()
        ):
            self._completer = threading.Thread(
                target=self._completer_loop,
                name="ars-serving-completer",
                daemon=True,
            )
            self._completer.start()
        return self

    def stop(self, timeout: float = 60.0):
        """Drain: queued jobs still dispatch, in-flight groups still
        download, then both threads exit.  Jobs submitted after (or
        racing) stop() fail with RuntimeError instead of hanging their
        futures forever."""
        self._stopped = True
        if self._thread is None:
            self._flush_orphans()
            return
        self._q.put(_STOP)
        self._thread.join(timeout=timeout)
        if self._thread.is_alive():
            log.warning(
                "batcher worker still busy after %.0fs stop timeout "
                "(mid-dispatch render?) — leaving the daemon thread to finish",
                timeout,
            )
            return
        self._thread = None
        if self._completer is not None:
            # the worker has exited, so every dispatched group is already
            # queued here — _STOP lands after the last of them
            self._cq.put(_STOP)
            self._completer.join(timeout=timeout)
            if self._completer.is_alive():
                log.warning(
                    "batcher completer still downloading after %.0fs stop "
                    "timeout — leaving the daemon thread to finish",
                    timeout,
                )
                return
            self._completer = None
        self._flush_orphans()

    def _flush_orphans(self):
        """Fail any item that slipped into the queue after the worker left."""
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is not _STOP:
                if item.future.set_running_or_notify_cancel():
                    item.future.set_exception(
                        RuntimeError("render service stopped")
                    )
                self._release_inputs([item])

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            sizes = list(self._batch_sizes)
            out = {
                "batches": len(sizes),
                "batch_sizes": sizes,
                "jobs_done": self._jobs_done,
                "jobs_failed": self._jobs_failed,
                "queued": self._q.qsize(),
                "pipeline_depth": self.pipeline_depth,
                # per-phase totals: where the wall-clock goes.  dispatch =
                # host-stack+upload+launch on the worker; fetch = result
                # download+trim.  With pipelining these overlap, so their
                # sum can exceed the elapsed serving time.
                "dispatch_s": round(self._dispatch_s, 3),
                "fetch_s": round(self._fetch_s, 3),
                # --- memory accounting (VERDICT r4 item 1) ---
                # clips+IRs held by jobs whose futures have not resolved
                "inflight_input_bytes": self._inflight_input_bytes,
                # result arrays delivered to callers and still alive (each
                # owns exactly its trimmed bytes — never a batch-buffer view)
                "retained_result_bytes": self._retained_result_bytes,
                "retained_results": self._retained_results,
                # cumulative host↔device volume — on axon this is also the
                # plugin's host-side leak estimate (restart watermark)
                "dispatched_input_bytes_total": (
                    self._dispatched_input_bytes_total
                ),
                "fetched_result_bytes_total": (
                    self._fetched_result_bytes_total
                ),
            }
        out.update(memory_stats())
        return out

    # --- submission ---
    def submit(self, job: RenderJob) -> "Future[RenderResult]":
        """Validate, key, and enqueue a job.  Invalid jobs raise HERE
        (fail-fast ValueError), never poison the worker; an overloaded or
        stopped service raises RuntimeError (HTTP: 503)."""
        if self._stopped:
            raise RuntimeError("render service stopped")
        if self._q.qsize() >= self.max_queued:
            raise RuntimeError(
                f"render service overloaded ({self.max_queued} jobs queued) — retry later"
            )
        item = self._prepare(job)
        item.nbytes = item.clip.nbytes + (
            item.prepared_ir.nbytes if item.prepared_ir is not None else 0
        )
        fut: "Future[RenderResult]" = Future()
        item.future = fut
        with self._lock:
            self._inflight_input_bytes += item.nbytes
        self._q.put(item)
        return fut

    def _release_inputs(self, items: List["_Item"]):
        """Input accounting: these items' futures just resolved (result,
        error, or cancellation) — their clips/IRs are no longer held by
        the service pipeline."""
        freed = sum(it.nbytes for it in items)
        if freed:
            with self._lock:
                self._inflight_input_bytes -= freed

    def render(self, job: RenderJob, timeout: Optional[float] = None) -> RenderResult:
        """Synchronous convenience: submit + wait."""
        return self.submit(job).result(timeout=timeout)

    # --- internals ---
    def _prepare(self, job: RenderJob) -> _Item:
        from ..models import pipeline
        from ..parallel.sharding import bucket_length

        audio = np.asarray(job.audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[:, None]
        if audio.ndim != 2 or audio.shape[0] < 1:
            raise ValueError(
                f"job audio must be (N,) or (N, C) with N >= 1, got {audio.shape}"
            )
        rate = int(job.rate)
        if rate <= 0:
            raise ValueError(f"job rate must be positive (got {job.rate})")
        if not isinstance(job.params, RenderParams):
            raise ValueError("job.params must be a RenderParams")
        clip = pipeline._ensure_stereo_host(audio)
        # EQ-on jobs bucket like everything else: render_batch runs the
        # circular EQ length-DYNAMICALLY for padded clips (chirps from the
        # traced true length — apply_shelf_eq_dynamic), so one executable
        # per (rate, bucket) serves any clip length. No per-length compiles.
        n_bucket = bucket_length(clip.shape[0], rate)

        streaming = (
            self.streaming_threshold_s is not None
            and clip.shape[0] > self.streaming_threshold_s * rate
        )

        if job.params.use_external_ir:
            if job.external_ir is None:
                raise ValueError("use_external_ir=True requires job.external_ir")
            prepared = pipeline.prepare_external_ir(
                job.external_ir,
                int(job.external_ir_rate) if job.external_ir_rate else rate,
                rate,
            )
            if streaming:
                # singleton group; n_bucket = true length → real_len = len_out
                key = ("streaming", uuid.uuid4().hex)
                return _Item(job, None, key, clip, clip.shape[0], prepared)
            # jobs sharing the same prepared IR bytes may share one batch
            # (render_batch convolves the whole batch against ONE IR)
            ir_digest = hashlib.sha1(prepared.tobytes()).hexdigest()
            key = (
                "external", rate, n_bucket, job.params.target_layout,
                prepared.shape, ir_digest, bool(job.with_metrics),
            )
            return _Item(job, None, key, clip, n_bucket, prepared)

        if streaming:
            # fast_filters is honored end to end: the streaming renderer
            # runs the exact-length air transform when the service is
            # configured exact (round-4 VERDICT item 4)
            key = ("streaming", uuid.uuid4().hex)
            return _Item(job, None, key, clip, clip.shape[0], None)

        # shape-only derivation: no device scalars on the submit thread
        # (render_batch rebuilds the full setup at dispatch)
        spec, ir_shape = pipeline.build_internal_spec(
            job.params, rate, n_bucket, fast_filters=self.fast_filters
        )
        # value-driven stage flags (EQ on/off, air on/off, early/late levels)
        # are widened batch-wide by render_batch with exact per-clip
        # semantics — normalize them out of the key so such jobs batch
        neutral_spec = spec._replace(
            eq_on=False, air_on=False, early_on=False, late_on=False
        )
        key = ("internal", neutral_spec, ir_shape, bool(job.with_metrics))
        return _Item(job, None, key, clip, n_bucket, None)

    def _worker(self):
        pending: Dict[tuple, List[_Item]] = {}
        deadlines: Dict[tuple, float] = {}
        draining = False
        while True:
            item = None
            if not draining:
                timeout = None
                if deadlines:
                    timeout = max(0.0, min(deadlines.values()) - time.monotonic())
                try:
                    item = self._q.get(timeout=timeout)
                except queue.Empty:
                    item = None
            else:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    item = None
            if item is _STOP:
                draining = True
                item = None
            if item is not None:
                group = pending.setdefault(item.key, [])
                group.append(item)
                deadlines.setdefault(item.key, time.monotonic() + self.max_wait_s)
                if len(group) >= self.max_batch:
                    deadlines.pop(item.key, None)
                    self._dispatch(pending.pop(item.key))
                # drop the bindings BEFORE blocking on the next get(): a
                # stale `group`/`item` held across an idle wait pins the
                # dispatched items → futures → results indefinitely
                del group, item
                continue
            # timeout path (or draining): flush due groups oldest-first
            now = time.monotonic()
            due = sorted(
                (d, k) for k, d in deadlines.items() if draining or d <= now
            )
            for _, k in due:
                deadlines.pop(k, None)
                self._dispatch(pending.pop(k))
            if draining and not pending and self._q.empty():
                return

    def _dispatch(self, items: List[_Item]):
        live = [it for it in items if it.future.set_running_or_notify_cancel()]
        if len(live) != len(items):
            self._release_inputs([it for it in items if it not in live])
        items = live
        if not items:
            return
        with self._lock:
            self._batch_sizes.append(len(items))
        t0 = time.monotonic()
        try:
            fetch = self._render_group(items)
        except Exception as e:  # noqa: BLE001 — job error, not worker death
            log.exception("batch of %d failed at dispatch", len(items))
            with self._lock:
                self._jobs_failed += len(items)
            for it in items:
                it.future.set_exception(e)
            self._release_inputs(items)
            return
        with self._lock:
            self._dispatch_s += time.monotonic() - t0
            self._dispatched_input_bytes_total += sum(
                it.nbytes for it in items
            )
        if self._cq is not None:
            # hand the download to the completer; blocks once
            # pipeline_depth-1 groups are already awaiting download —
            # that bound is what keeps in-flight device results finite
            self._cq.put((items, fetch))
        else:
            self._complete(items, fetch)

    def _completer_loop(self):
        while True:
            entry = self._cq.get()
            if entry is _STOP:
                return
            self._complete(*entry)
            # drop the binding BEFORE blocking on the next get(): a loop
            # variable held across an idle wait pins the just-completed
            # batch's items → futures → results indefinitely (found by the
            # retained_result accounting this loop feeds)
            del entry

    def _complete(self, items: List[_Item], fetch):
        """Download + trim one dispatched group and resolve its futures."""
        t0 = time.monotonic()
        try:
            outs, metrics = fetch()
        except Exception as e:  # noqa: BLE001 — job error, not thread death
            log.exception("batch of %d failed at result fetch", len(items))
            with self._lock:
                self._jobs_failed += len(items)
            for it in items:
                it.future.set_exception(e)
            self._release_inputs(items)
            return
        with self._lock:
            self._fetch_s += time.monotonic() - t0
            self._fetched_result_bytes_total += outs.nbytes
        n_bucket = items[0].n_bucket
        ir_tail = outs.shape[1] - n_bucket  # = ir_len − 1
        svc_ref = weakref.ref(self)
        for i, it in enumerate(items):
            real_len = it.clip.shape[0] + ir_tail
            # .copy(), not ascontiguousarray: the contiguous slice is a VIEW
            # whose .base is the whole (batch, len_out, ch) download buffer —
            # one retained job result would pin the entire batch's bytes (a
            # registry of 256 completed jobs pinned GBs this way)
            audio = outs[i, :real_len].copy()
            with self._lock:
                self._retained_result_bytes += audio.nbytes
                self._retained_results += 1
            weakref.finalize(audio, _untrack_result, svc_ref, audio.nbytes)
            result = RenderResult(
                audio=audio,
                rate=int(it.job.rate),
                metrics=metrics[i] if metrics is not None else None,
            )
            it.future.set_result(result)
        self._release_inputs(items)
        with self._lock:
            self._jobs_done += len(items)

    def bucket_sizes(self) -> List[int]:
        """The executable batch-size buckets this service dispatches at.

        Powers of two capped at ``max_batch``, each rounded up to a
        multiple of the mesh data axis — the fixed points of
        ``_batch_pad`` (every bucket pads to itself, so ``warm()`` and
        production traffic compile the SAME executable set even when the
        data axis is not a power of two).  This is the set ``warm()``
        pre-compiles.
        """
        raw = {1 << k for k in range(self.max_batch.bit_length())}
        raw = {b for b in raw if b <= self.max_batch} | {self.max_batch}
        if self.device_mesh is not None:
            from ..parallel import mesh as meshlib

            d = self.device_mesh.shape[meshlib.DATA_AXIS]
            raw = {b + (-b) % d for b in raw}
        return sorted(raw)

    def warm(
        self, job: RenderJob, sizes: Optional[List[int]] = None
    ) -> List[int]:
        """Pre-compile the batched render executable for every batch-size
        bucket of ``job``'s static signature.

        The compiled XLA program is keyed on (static spec, padded batch
        size); which bucket a production group lands in depends on arrival
        timing, so without warming, traffic keeps discovering fresh buckets
        at request latency — on the axon tunnel a fresh bucket is a
        multi-minute compile (measured: a 48-job burst warmed buckets
        {2, 48} then hit bucket 4 cold in the measured pass, +35 s,
        BENCH_HISTORY round-4 session 2).  Call this once per expected
        signature before taking traffic; compiles land in the persistent
        XLA cache, so subsequent processes warm in seconds.

        Dispatches ONE template-filled batch per bucket synchronously on
        the calling thread (compilation happens inside the dispatch call;
        results are dropped undownloaded).  Call before ``submit`` traffic
        — it does not coordinate with the worker's own dispatches.

        Returns the bucket sizes warmed.
        """
        item = self._prepare(job)
        if item.key[0] == "streaming":
            raise ValueError(
                "streaming-routed jobs have no batch buckets to warm "
                "(the streaming renderer keys on chunk shape, not batch)"
            )
        if sizes is None:
            sizes = self.bucket_sizes()
        else:
            sizes = sorted(
                {
                    b + self._batch_pad(b)
                    for b in (min(max(1, int(s)), self.max_batch) for s in sizes)
                }
            )
        for b in sizes:
            # compilation is synchronous inside the dispatch; dropping the
            # fetch closure frees the device results without a download
            self._render_group([item] * b)
        return sizes

    def _batch_pad(self, batch: int) -> int:
        """Pad count that rounds ``batch`` up to its executable size bucket.

        The compiled XLA program is keyed on the batch dimension, and a
        group's size depends on arrival timing — unbucketed, production
        traffic keeps hitting fresh batch sizes and pays a multi-minute
        tunnel compile each time (measured: a 48-job burst that warmed as
        3+45 dispatched as 4+44 and recompiled both, BENCH_HISTORY round-4
        session 2).  Buckets are powers of two capped at ``max_batch``
        (e.g. {1,2,4,8,16,32,48} for max_batch=48): O(log max_batch)
        executables total, ≤2× zero-pad upload waste worst-case, and pad
        rows never download — render_batch slices them off on device
        (``real_batch``).  A mesh's data axis still divides the result.

        Pads to the smallest ``bucket_sizes()`` entry ≥ batch, so every
        bucket is a fixed point: a group that arrives AT a bucket size
        dispatches at that size even when the mesh data axis is not a
        power of two (d=3: bucket 3 stays 3, not 6).
        """
        for b in self.bucket_sizes():
            if b >= batch:
                return b - batch
        return 0  # batch > every bucket: only reachable if batch > top
                  # bucket, which dispatch grouping (≤ max_batch) prevents

    def _render_group(self, items: List[_Item]):
        """Stack + dispatch one group.  Returns a zero-arg ``fetch()``
        producing ``(outs, metrics)`` — the download happens when it runs
        (on the completer thread in pipelined mode)."""
        from ..parallel.sharding import render_batch

        if items[0].key[0] == "streaming":
            # the streaming renderer is internally slab-pipelined and
            # returns host arrays; run it here (the worker) so a minutes-
            # long job cannot head-of-line-block micro-batch downloads
            streamed = self._render_streaming(items[0])
            return lambda: streamed

        n_bucket = items[0].n_bucket
        rate = int(items[0].job.rate)
        with_metrics = bool(items[0].job.with_metrics)
        batch = len(items)

        pad = self._batch_pad(batch)

        clips = np.zeros((batch + pad, n_bucket, 2), dtype=np.float32)
        for i, it in enumerate(items):
            clips[i, : it.clip.shape[0]] = it.clip
        param_list = [it.job.params for it in items]
        param_list += [param_list[-1]] * pad
        seeds = [int(it.job.seed) for it in items] + [0] * pad
        true_lens = [it.clip.shape[0] for it in items] + [n_bucket] * pad

        kwargs: Dict[str, Any] = dict(
            seeds=seeds,
            device_mesh=self.device_mesh,
            with_metrics=with_metrics,
            fast_filters=self.fast_filters,
            pcm16_output=self.pcm16_output,
            # always given: true lengths drive BOTH the masked meter and the
            # length-dynamic exact EQ of padded EQ-on clips (the shard_map
            # Pallas path supports the full option matrix since round 4)
            clip_lengths=true_lens,
        )
        if items[0].key[0] == "external":
            kwargs["external_ir"] = items[0].prepared_ir
            kwargs["external_ir_rate"] = rate  # already rate-matched
        else:
            kwargs["ir_backend"] = self.ir_backend

        fetch_raw = render_batch(
            clips, rate, param_list, async_results=True, real_batch=batch,
            **kwargs,
        )

        def fetch():
            # pad rows were sliced off on device (real_batch) — only the
            # real jobs rode the tunnel download
            result = fetch_raw()
            if with_metrics:
                outs, metrics = result
                return np.asarray(outs), metrics
            return np.asarray(result), None

        return fetch

    def _render_streaming(self, it: _Item):
        """Singleton long-clip job through the bounded-memory streaming
        renderer (``n_bucket`` was set to the true length at submit, so the
        shared trim math reduces to the identity)."""
        from ..parallel.streaming import render_streaming

        job = it.job
        kwargs: Dict[str, Any] = dict(
            seed=int(job.seed),
            chunk_seconds=self.chunk_seconds,
            with_metrics=bool(job.with_metrics),
            pcm16_output=self.pcm16_output,
            fast_filters=self.fast_filters,
        )
        if it.prepared_ir is not None:
            kwargs["external_ir"] = it.prepared_ir
            kwargs["external_ir_rate"] = int(job.rate)  # already rate-matched
        result = render_streaming(it.clip, int(job.rate), job.params, **kwargs)
        if job.with_metrics:
            out, metrics = result
            return np.asarray(out)[None], [metrics]
        return np.asarray(result)[None], None
