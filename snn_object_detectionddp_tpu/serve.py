"""Streaming detection service: per-stream recurrent state over HTTP.

The deployment counterpart of the offline ``video.py`` loop (reference:
visualize.py drives frames from disk; here frames arrive over the wire).
Design for the TPU serving path:

- ONE device worker thread owns the chip and runs the jitted T=1
  streaming step (`Detector` forward with carried recurrent state +
  on-device decode/NMS). HTTP handler threads enqueue requests; the
  worker drains the queue in arrival order.
- **Cross-stream micro-batching** (the standard TPU serving move): the
  worker drains up to ``max_batch`` queued jobs from *distinct* streams,
  stacks their images and recurrent-state pytrees along the batch axis,
  and runs ONE B=K program — so N concurrent streams ride the chip's
  batch throughput (~2.3 ms/frame at B=32) instead of serializing at the
  B=1 latency (~3.5 ms + dispatch each). Same-stream jobs are deferred to
  the next round (state must chain). Batch sizes are padded up to a
  power of two so only log2(max_batch)+1 programs ever compile. The
  state stack and the per-stream re-slice both live INSIDE the jitted
  program (tuple of per-stream states in, tuple out): done eagerly they
  cost one dispatch round-trip per state leaf per stream — ~180
  dispatches / ~880 ms per K=8 batch through the tunneled dev backend
  (round-4 serving bench) — while in-program they are free layout ops.
- Per-stream recurrent state lives on device between requests, keyed by
  the client's ``stream`` id (the SNN/ConvLSTM state is the whole point
  of the model: detections integrate the stream's history).
- Fixed input geometry (the model's configured image size): the program
  set is compiled at warmup, no recompiles at serve time.
- **Tensor-parallel latency mesh** (``mesh.tensor > 1`` in config): the
  forward channel-shards over a 1 x tensor device mesh
  (parallel/mesh.py::tp_param_shardings) so the B=1 step — the latency
  floor no amount of batching can cut — splits across chips. Outputs and
  recurrent states replicate, so the state registry, micro-batching, and
  clip chaining are identical; inference-only by design
  (docs/PARALLELISM.md).

Endpoints (JSON):
  POST /detect  {"stream": "cam0", "image": <base64 png/jpg>}
      -> {"boxes": [[x1,y1,x2,y2],...], "scores": [...], "classes": [...],
          "latency_ms": float}
  POST /detect  {"stream": "cam0", "images": [<base64>, ...]}   (clip)
      -> {"frames": [{boxes,scores,classes}, ...], "latency_ms": float}
      A clip of consecutive frames runs in chained chunk dispatches with
      the decoder/head folded over the whole chunk (all_steps decode) —
      per-frame detections, same math as frame-by-frame, far fewer
      dispatches (the chip's batched conv rate instead of B=1 latency).
  POST /reset   {"stream": "cam0"}   -> {"ok": true}   (drop state)
  GET  /healthz -> {"ok": true, "streams": N, "backend": "tpu"}

Run: python -m snn_object_detectionddp_tpu.serve --config config.yaml \
        --weights runs/train/exp1/best.pt --port 8000
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any


@dataclass
class _Job:
    stream: str
    image_u8: Any  # (H, W, 3) uint8 numpy — or (T, H, W, 3) when clip=True
    reply: queue.Queue = field(default_factory=lambda: queue.Queue(maxsize=1))
    t0: float = field(default_factory=time.perf_counter)  # enqueue time
    clip: bool = False  # multi-frame chunk: per-frame detections, one job
    # Set by _submit when the caller gave up (reply timeout): the worker
    # drops the job at admission time instead of executing it — otherwise
    # the orphaned job would still advance the stream's recurrent state
    # and a client retry would double-integrate the frame. Best-effort: a
    # job cancelled after it entered a running batch still executes.
    cancelled: threading.Event = field(default_factory=threading.Event)


class DetectionService:
    """Device worker + per-stream state registry (transport-agnostic)."""

    def __init__(self, detector, params, conf: float = 0.3, iou: float = 0.45,
                 max_det: int = 100, max_streams: int = 64,
                 max_batch: int = 8, reply_timeout_s: float = 120.0,
                 max_clip: int = 8, mesh=None):
        import jax
        import jax.numpy as jnp

        from .data.encoding import preprocess_video
        from .models.detect import decode_predictions
        from .ops.nms import batched_nms

        self.detector = detector
        # Optional tensor-parallel latency mesh (1 x tensor): conv output
        # channels + activations shard over the ``tensor`` axis so the
        # B=1 forward — the streaming latency floor (BASELINE.md) — splits
        # across chips. Inference-only by design (parallel/mesh.py::
        # tp_param_shardings); outputs and recurrent states replicate, so
        # the per-stream state registry and micro-batching are unchanged.
        self.mesh = mesh
        self.tensor_parallel = 1
        _fold_sharding = _rep = _params_sh = None
        if mesh is not None:
            from .parallel.mesh import (
                TENSOR_AXIS,
                data_axis_size,
                fold_sharding,
                replicate_sharding,
                tp_param_shardings,
            )

            if TENSOR_AXIS not in mesh.axis_names or data_axis_size(mesh) != 1:
                raise ValueError(
                    "serve mesh must be a 1 x tensor latency mesh "
                    "(parallel.mesh.make_mesh(1, tensor=k) — "
                    "docs/PARALLELISM.md)"
                )
            if detector.cfg.runtime.lif_kernel == "pallas":
                raise ValueError(
                    "runtime.lif_kernel=pallas is not partitionable "
                    "(opaque custom call); use the XLA LIF path for "
                    "tensor-parallel serving"
                )
            self.tensor_parallel = mesh.shape[TENSOR_AXIS]
            _fold_sharding = fold_sharding
            _rep = replicate_sharding(mesh)
            _params_sh = tp_param_shardings(mesh, params)
        # One-time device placement: checkpoint-restored params are host
        # numpy, and passing them to the jit per request re-uploads the
        # whole model every call (measured seconds/request through the
        # dev tunnel). Committed device arrays are reused by every call.
        # Under a tensor mesh each leaf lands channel-sharded instead.
        self.params = jax.device_put(
            params, _params_sh
        ) if mesh is not None else jax.device_put(params)
        self.max_streams = max_streams
        self.reply_timeout_s = reply_timeout_s
        h, w = detector.cfg.model.image_size
        self.image_hw = (h, w)
        reg_max = detector.cfg.model.hyp.reg_max
        nc = detector.cfg.model.num_classes
        # Padded program sizes: 1, 2, 4, ... max_batch — a fixed, small
        # set of compiled programs; a drained batch runs at the next size
        # up, padded with zero images/states (discarded slots).
        self.batch_sizes = []
        k = 1
        while k < max_batch:
            self.batch_sizes.append(k)
            k *= 2
        self.batch_sizes.append(max_batch)
        self.max_batch = max_batch

        # Recurrent-state structure, computed shape-only (no device work)
        # straight from the module: B=1 gives the per-stream state layout,
        # and diffing B=1 vs B=2 gives each leaf's BATCH AXIS — axis 0 for
        # conv-style leaves (B, H, W, C) but axis 1 for the token-LSTM
        # carry (num_layers, B, hidden); stacking/slicing a hardcoded
        # axis 0 would mis-batch the latter (caught in review;
        # tests/test_serve.py pins the lstm bottleneck end-to-end).
        def _state_struct(b: int):
            return jax.eval_shape(
                lambda p, img: detector.module.apply(
                    {"params": p},
                    preprocess_video(img[:, None], dtype=detector.module.dtype),
                    None,
                )[1],
                self.params,
                jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8),
            )

        struct = _state_struct(1)
        struct2 = _state_struct(2)

        def _batch_axis(s1, s2):
            diffs = [
                i for i, (a, b) in enumerate(zip(s1.shape, s2.shape)) if a != b
            ]
            if len(diffs) != 1:
                raise ValueError(
                    "cannot infer the batch axis of a recurrent-state leaf "
                    f"(B=1 shape {s1.shape} vs B=2 shape {s2.shape})"
                )
            return diffs[0]

        self._state_axes = state_axes = jax.tree.map(
            _batch_axis, struct, struct2
        )
        # Fresh-stream state: the model zero-inits recurrent state on the
        # first step (state=None), so a zeros pytree of the B=1 structure
        # is the exact first-frame state; every program size K then sees
        # only concrete states (one trace per size — no state=None
        # signature). Replicated-on-mesh under TP so the registry sees one
        # uniform sharding; default device otherwise.
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), struct)
        self._zero_state1 = (
            jax.device_put(zeros, _rep) if mesh is not None
            else jax.device_put(zeros)
        )

        def predict_impl(params, images_u8, rec_states):
            # images_u8: (K, H, W, 3) -> time-major (1, K, H, W, 3).
            # rec_states: tuple of K per-stream B=1 state pytrees. The
            # stack and the per-stream re-slice live INSIDE the jit: done
            # eagerly they cost one dispatch round-trip per leaf per
            # stream through a tunneled backend (~180 dispatches at K=8 —
            # measured ~880 ms/batch, the round-4 serving-bench
            # pathology); fused here they are free layout ops in the one
            # compiled program. Tuple arity is part of the jit signature,
            # so this still compiles exactly once per padded size K.
            if len(rec_states) == 1:
                rec_state = rec_states[0]
            else:
                rec_state = jax.tree.map(
                    lambda ax, *xs: jnp.concatenate(xs, axis=ax),
                    state_axes,
                    *rec_states,
                )
            frames = preprocess_video(
                images_u8[:, None], dtype=detector.module.dtype
            )
            raw, new_state = detector.module.apply(
                {"params": params}, frames, rec_state
            )
            boxes, scores = decode_predictions(
                raw, reg_max, nc, image_hw=(h, w)
            )
            out = batched_nms(
                boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det
            )
            new_states = tuple(
                jax.tree.map(
                    lambda ax, x, i=i: jax.lax.slice_in_dim(
                        x, i, i + 1, axis=ax
                    ),
                    state_axes,
                    new_state,
                )
                for i in range(len(rec_states))
            )
            return out, new_states

        def _jit(fn):
            """jit a predict-shaped fn; under a tensor mesh, pin the fold
            shardings at trace time (the same trace-time context the
            spatial eval path uses) and make outputs + states replicated
            so everything downstream of the jit is mesh-agnostic."""
            if mesh is None:
                return jax.jit(fn)

            def spmd(params, images_u8, rec_state):
                with _fold_sharding(mesh):
                    return fn(params, images_u8, rec_state)

            return jax.jit(
                spmd,
                in_shardings=(_params_sh, _rep, _rep),
                out_shardings=_rep,
            )

        self._predict = _jit(predict_impl)

        # Clip (chunk) program: T frames of ONE stream per dispatch, the
        # decoder/head running once on the folded (T*1) batch (all_steps
        # decode — math identical to T chained single-frame calls,
        # tests/test_streaming.py). Compiled at the power-of-two sizes
        # {2, 4, ..., max_clip}; longer clips chain greedily (8+4+1...).
        # The Pallas LIF kernel cannot emit the per-step readouts this
        # needs, so clip support turns off under runtime.lif_kernel=pallas.
        if detector.cfg.runtime.lif_kernel == "pallas":
            max_clip = 1
        self.clip_sizes = []
        k = 2
        while k <= max_clip:
            self.clip_sizes.append(k)
            k *= 2
        self.max_clip = max_clip
        # Request-size bound: a clip occupies the single serial worker for
        # ceil(T / max_clip) dispatches, so an unbounded T would let one
        # oversized POST starve every other stream past reply_timeout_s
        # (the same monopolization the per-stream deferral cap prevents).
        self.max_clip_frames = max(8 * max_clip, 8)

        def predict_clip_impl(params, images_u8, rec_state):
            # images_u8: (T, H, W, 3) -> window (T, 1, H, W, 3)
            frames = preprocess_video(
                images_u8[None], dtype=detector.module.dtype
            )
            raw, new_state = detector.module.apply(
                {"params": params}, frames, rec_state, all_steps=True
            )  # raw maps: leading dim T*1 = one row per frame
            boxes, scores = decode_predictions(
                raw, reg_max, nc, image_hw=(h, w)
            )
            out = batched_nms(
                boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det
            )
            return out, new_state

        self._predict_clip = _jit(predict_clip_impl)
        self._states: dict[str, Any] = {}
        self._lru: list[str] = []
        # Per-stream cap on worker-local deferrals (see _next_jobs).
        self._max_deferred_per_stream = 8
        # Per-stream generation counter: bumped by every state drop
        # (/reset or LRU eviction). The worker snapshots the generation
        # with the state and only commits the post-predict state if it is
        # unchanged — so a reset landing while that stream's detect is in
        # flight cannot be silently overwritten by the stale result.
        self._gen: dict[str, int] = {}
        # Guards _states/_lru/_gen: mutated by the device worker AND by
        # /reset from HTTP handler threads.
        self._state_lock = threading.Lock()
        self._q: queue.Queue[_Job | None] = queue.Queue(maxsize=256)
        # Same-stream jobs deferred from a drained batch (state must
        # chain); worker-local FIFO consumed before the queue.
        self._deferred: list[_Job] = []
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._started = False

    # -- lifecycle ---------------------------------------------------------
    def start(self):
        if not self._started:
            self._worker.start()
            self._started = True
        return self

    def stop(self):
        if self._started:
            self._q.put(None)
            self._worker.join(timeout=10)
            self._started = False

    def warmup(self):
        """Compile every program size before accepting traffic (all sizes
        see only concrete-state signatures — see _zero_state1); a size
        first hit at serve time would stall its whole batch on a fresh
        multi-minute compile."""
        import jax
        import numpy as np

        h, w = self.image_hw
        for k in self.batch_sizes:
            imgs = np.zeros((k, h, w, 3), np.uint8)
            states = tuple([self._zero_state1] * k)
            out, _ = self._predict(self.params, imgs, states)
            jax.block_until_ready(out)
        for t in self.clip_sizes:
            clip = np.zeros((t, h, w, 3), np.uint8)
            out, _ = self._predict_clip(self.params, clip, self._zero_state1)
            jax.block_until_ready(out)

    # -- API ---------------------------------------------------------------
    def detect(self, stream: str, image_u8) -> dict:
        h, w = self.image_hw
        if image_u8.shape != (h, w, 3):
            raise ValueError(
                f"expected {(h, w, 3)} uint8 image, got {image_u8.shape} "
                "(the serving program is compiled for the configured "
                "model.image_size; resize client-side)"
            )
        return self._submit(_Job(stream, image_u8))

    def detect_clip(self, stream: str, clip_u8) -> dict:
        """Run T consecutive frames of one stream in chained chunk
        dispatches; returns {"frames": [per-frame dicts], "latency_ms"}.
        Math identical to T sequential :meth:`detect` calls; state advances
        by all T frames."""
        h, w = self.image_hw
        if clip_u8.ndim != 4 or clip_u8.shape[1:] != (h, w, 3):
            raise ValueError(
                f"expected (T, {h}, {w}, 3) uint8 clip, got {clip_u8.shape}"
            )
        if clip_u8.shape[0] > self.max_clip_frames:
            raise ValueError(
                f"clip too long ({clip_u8.shape[0]} > {self.max_clip_frames} "
                "frames); split it across requests (state carries over)"
            )
        if clip_u8.shape[0] == 1:
            out = self.detect(stream, clip_u8[0])
            return {
                "frames": [{k: out[k] for k in ("boxes", "scores", "classes")}],
                "latency_ms": out["latency_ms"],
                "chunks": 1,
            }
        return self._submit(_Job(stream, clip_u8, clip=True))

    def _submit(self, job: _Job) -> dict:
        if not (self._started and self._worker.is_alive()):
            raise RuntimeError("detection worker is not running")
        self._q.put(job)
        # Bounded wait + liveness check: a crashed worker must surface as
        # an error to the caller, never a forever-blocked HTTP handler.
        deadline = time.perf_counter() + self.reply_timeout_s
        while True:
            try:
                out = job.reply.get(timeout=1.0)
                break
            except queue.Empty:
                if not self._worker.is_alive():
                    raise RuntimeError(
                        "detection worker died while processing"
                    ) from None
                if time.perf_counter() > deadline:
                    # Mark the orphan so the worker drops it instead of
                    # executing it later (which would advance the stream
                    # state with nobody reading the result — and a client
                    # retry of the same frame would then apply it twice).
                    job.cancelled.set()
                    raise TimeoutError(
                        f"no result within {self.reply_timeout_s}s"
                    ) from None
        if isinstance(out, Exception):
            raise out
        return out

    def reset(self, stream: str) -> None:
        with self._state_lock:
            self._drop_stream_locked(stream)

    def _drop_stream_locked(self, stream: str) -> None:
        self._states.pop(stream, None)
        if stream in self._lru:
            self._lru.remove(stream)
        # Invalidate any in-flight compute for this stream (see _gen).
        self._gen[stream] = self._gen.get(stream, 0) + 1

    @property
    def num_streams(self) -> int:
        return len(self._states)

    # -- device worker -----------------------------------------------------
    def _next_jobs(self) -> list | None:
        """Blocking take of one job, then a non-blocking drain of up to
        max_batch jobs from *distinct* streams (a stream's requests must
        chain through its state, so same-stream jobs defer to the next
        round — and a stream with ANY deferred job is blocked entirely,
        preserving per-stream FIFO: admitting a fresh frame past a
        deferred clip would integrate frames out of order). Returns None
        on the stop sentinel."""
        first = None
        while first is None:
            if self._deferred:
                first = self._deferred.pop(0)
            else:
                first = self._q.get()
                if first is None:
                    return None
            if first.cancelled.is_set():  # caller timed out: drop, don't run
                first = None
        if first.clip:
            # A clip occupies the whole dispatch (its T axis IS the batch
            # through the folded decoder); never mixed with other jobs.
            return [first]
        jobs = [first]
        streams = {first.stream}
        # Deferred jobs first (FIFO per stream), then fresh queue items.
        # `streams` doubles as the block set: every deferred entry we skip
        # adds its stream, so nothing later (deferred OR fresh) from that
        # stream can jump the queue this round.
        i = 0
        while i < len(self._deferred):
            d = self._deferred[i]
            if d.cancelled.is_set():
                self._deferred.pop(i)
                continue
            if d.clip or d.stream in streams or len(jobs) >= self.max_batch:
                streams.add(d.stream)
                i += 1
                continue
            self._deferred.pop(i)
            jobs.append(d)
            streams.add(d.stream)
        while len(jobs) < self.max_batch:
            try:
                nxt = self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post: stop after this batch
                break
            if nxt.cancelled.is_set():
                continue
            if nxt.clip or nxt.stream in streams:
                # Backpressure: _deferred sits OUTSIDE the bounded request
                # queue, so without a cap a client pipelining one stream
                # faster than its serial chain drains would grow it (and
                # its ~1 MB pinned frames) without bound. Beyond a couple
                # of rounds' worth per stream, fail fast instead.
                if (
                    sum(1 for d in self._deferred if d.stream == nxt.stream)
                    >= self._max_deferred_per_stream
                ):
                    nxt.reply.put(
                        RuntimeError(
                            f"stream '{nxt.stream}' overloaded: requests "
                            "chain serially through its recurrent state; "
                            "slow down or use distinct streams"
                        )
                    )
                else:
                    self._deferred.append(nxt)
                    # Block the stream for the rest of this drain: a later
                    # fresh frame must not be admitted ahead of the job we
                    # just deferred (per-stream FIFO).
                    streams.add(nxt.stream)
            else:
                jobs.append(nxt)
                streams.add(nxt.stream)
        return jobs

    def _run(self):
        import jax
        import numpy as np

        while True:
            jobs = self._next_jobs()
            if jobs is None:
                # Answer anything still queued so no caller blocks on a
                # retired worker.
                leftovers = list(self._deferred)
                self._deferred.clear()
                while True:
                    try:
                        j = self._q.get_nowait()
                    except queue.Empty:
                        break
                    if j is not None:
                        leftovers.append(j)
                for j in leftovers:
                    j.reply.put(RuntimeError("service stopped"))
                return
            try:
                if jobs[0].clip:
                    self._run_clip(jobs[0])
                    continue
                n = len(jobs)
                k = next(s for s in self.batch_sizes if s >= n)
                with self._state_lock:
                    # Prune generation counters of dead streams (reset/LRU
                    # eviction leaves them behind; unbounded over a long
                    # service life). Safe here: the worker is serial, so
                    # between batches nothing is in flight, and counters
                    # for this batch's streams are kept. A pruned stream
                    # restarting at gen 0 is fine — any value mismatch
                    # still discards stale commits.
                    keep = {j.stream for j in jobs}
                    for s in [
                        s
                        for s in self._gen
                        if s not in self._states and s not in keep
                    ]:
                        del self._gen[s]
                    entries = [
                        (self._states.get(j.stream), self._gen.get(j.stream, 0))
                        for j in jobs
                    ]
                states = [
                    s if s is not None else self._zero_state1
                    for s, _ in entries
                ]
                states += [self._zero_state1] * (k - n)  # padded slots
                images = np.zeros((k, *self.image_hw, 3), np.uint8)
                for i, j in enumerate(jobs):
                    images[i] = j.image_u8
                out, new_states = self._predict(
                    self.params, images, tuple(states)
                )
                host = jax.device_get(out)
                # Per-stream B=1 states come back pre-sliced from inside
                # the jit (padded slots discarded) — no eager device ops.
                per_job_states = list(new_states[:n])
                with self._state_lock:
                    for j, st, (_, gen0) in zip(jobs, per_job_states, entries):
                        if self._gen.get(j.stream, 0) != gen0:
                            continue  # reset landed mid-flight: discard
                        self._states[j.stream] = st
                        if j.stream in self._lru:
                            self._lru.remove(j.stream)
                        self._lru.append(j.stream)
                    while len(self._lru) > self.max_streams:  # bound mem
                        self._drop_stream_locked(self._lru[0])
                now = time.perf_counter()
                for i, j in enumerate(jobs):
                    valid = host["valid"][i]
                    j.reply.put({
                        "boxes": np.asarray(
                            host["boxes"][i][valid]
                        ).round(2).tolist(),
                        "scores": np.asarray(
                            host["scores"][i][valid]
                        ).round(4).tolist(),
                        "classes": np.asarray(host["classes"][i][valid]).tolist(),
                        "latency_ms": round((now - j.t0) * 1e3, 2),
                        "batch": n,
                    })
            except Exception as e:  # surface to the callers, keep serving
                for j in jobs:
                    j.reply.put(e)

    def _run_clip(self, job: _Job) -> None:
        """One clip job: greedy chain of compiled chunk programs (largest
        power-of-two first), state carried across segments on device —
        per-frame detections with the exact sequential-call math."""
        import jax
        import numpy as np

        t_total = job.image_u8.shape[0]
        with self._state_lock:
            # Same dead-stream generation-counter prune as the batch path
            # (see _run): clip-only traffic must not grow _gen unboundedly.
            for s in [
                s
                for s in self._gen
                if s not in self._states and s != job.stream
            ]:
                del self._gen[s]
            st = self._states.get(job.stream)
            gen0 = self._gen.get(job.stream, 0)
        state = st if st is not None else self._zero_state1
        outs = []
        i = 0
        while i < t_total:
            rem = t_total - i
            size = next(
                (s for s in sorted(self.clip_sizes, reverse=True) if s <= rem),
                1,
            )
            seg = np.ascontiguousarray(job.image_u8[i : i + size])
            if size == 1:
                out, states_out = self._predict(self.params, seg, (state,))
                state = states_out[0]
            else:
                out, state = self._predict_clip(self.params, seg, state)
            outs.append(out)
            i += size
        host = jax.device_get(outs)
        with self._state_lock:
            if self._gen.get(job.stream, 0) == gen0:
                self._states[job.stream] = state
                if job.stream in self._lru:
                    self._lru.remove(job.stream)
                self._lru.append(job.stream)
                while len(self._lru) > self.max_streams:
                    self._drop_stream_locked(self._lru[0])
        now = time.perf_counter()
        frames = []
        for h in host:
            for r in range(h["valid"].shape[0]):
                valid = h["valid"][r]
                frames.append({
                    "boxes": np.asarray(h["boxes"][r][valid]).round(2).tolist(),
                    "scores": np.asarray(
                        h["scores"][r][valid]
                    ).round(4).tolist(),
                    "classes": np.asarray(h["classes"][r][valid]).tolist(),
                })
        job.reply.put({
            "frames": frames,
            "latency_ms": round((now - job.t0) * 1e3, 2),
            "chunks": len(outs),
        })


def make_handler(service: DetectionService):
    import cv2
    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._json(200, {"ok": True, "streams": service.num_streams,
                                 "backend": jax.default_backend(),
                                 "tensor_parallel": service.tensor_parallel})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                stream = str(req.get("stream", "default"))
                if self.path == "/reset":
                    service.reset(stream)
                    self._json(200, {"ok": True})
                    return
                if self.path != "/detect":
                    self._json(404, {"error": "unknown path"})
                    return
                h, w = service.image_hw

                def decode_one(b64):
                    bgr = cv2.imdecode(
                        np.frombuffer(base64.b64decode(b64), np.uint8),
                        cv2.IMREAD_COLOR,
                    )
                    if bgr is None:
                        return None
                    if bgr.shape[:2] != (h, w):
                        bgr = cv2.resize(bgr, (w, h))
                    return bgr[:, :, ::-1]

                if "images" in req:  # clip: consecutive frames, one call
                    imgs = [decode_one(b) for b in req["images"]]
                    if not imgs or any(i is None for i in imgs):
                        self._json(400, {"error": "undecodable image in clip"})
                        return
                    out = service.detect_clip(stream, np.stack(imgs))
                else:
                    rgb = decode_one(req["image"])
                    if rgb is None:
                        self._json(400, {"error": "undecodable image"})
                        return
                    out = service.detect(stream, rgb.copy())
                self._json(200, out)
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(cfg, weights: str | None, port: int = 8000, max_batch: int = 8,
          max_clip: int = 8):
    import jax

    from .models.detector import Detector
    from .train.checkpoint import load_checkpoint
    from .train.step import init_state, make_optimizer

    detector = Detector.from_config(cfg)
    if weights:
        tx, _ = make_optimizer(cfg.training.learning_rate, 1)
        template = jax.eval_shape(
            lambda r: init_state(detector.init_params(r), tx),
            jax.random.PRNGKey(0),
        )
        packed = load_checkpoint(weights, template)
        params = packed["state"]["params"]
        print(f"loaded {weights} (epoch {int(packed['epoch'])})", flush=True)
    else:
        params = detector.init_params(jax.random.PRNGKey(0))
        print("WARNING: serving a fresh random init (no --weights)", flush=True)
    # mesh.tensor > 1: channel-shard the forward over a 1 x tensor latency
    # mesh (inference-only TP — docs/PARALLELISM.md). Like eval_2, fall
    # back rather than fail when the configured LIF path cannot partition.
    mesh = None
    if cfg.mesh.tensor > 1:
        if cfg.runtime.lif_kernel == "pallas":
            print(
                "NOTE: runtime.lif_kernel=pallas is not partitionable; "
                "serving single-device (mesh.tensor ignored)", flush=True,
            )
        else:
            from .parallel.mesh import make_mesh

            mesh = make_mesh(1, tensor=cfg.mesh.tensor)
            print(
                f"tensor-parallel serving over {cfg.mesh.tensor} devices",
                flush=True,
            )
    service = DetectionService(
        detector, params, max_batch=max_batch, max_clip=max_clip, mesh=mesh
    ).start()
    print("compiling serving programs...", flush=True)
    service.warmup()
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    print(f"serving on :{port} (backend={jax.default_backend()})", flush=True)
    try:
        httpd.serve_forever()
    finally:
        service.stop()


if __name__ == "__main__":
    import argparse

    from .config import load_config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=8,
                    help="cross-stream micro-batch cap (power of two)")
    ap.add_argument("--max-clip", type=int, default=8,
                    help="largest compiled clip-chunk size (power of two); "
                         "1 disables clip programs")
    args = ap.parse_args()
    serve(load_config(args.config), args.weights, args.port, args.max_batch,
          args.max_clip)
