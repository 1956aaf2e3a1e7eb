"""Multi-stream real-time gaze serving.

The reference has no serving layer (SURVEY.md §1: research scripts
only); this is the production front-end for the fused per-frame step:
a fixed pool of S video streams advances in lockstep through ONE
compiled XLA program per tick (flow -> SP -> AT -> LF), with per-stream
recurrent state (LSTM carries, last attention weights, previous frame)
living in HBM between ticks. Static shapes: the pool size is fixed at
construction; inactive slots are masked, so stream attach/detach never
recompiles.

Throughput: one tick costs the same as one benchmark frame-step
(~1 ms for 128 streams at 224^2 on v5e — >1000 frames/sec/chip);
latency per tick is bounded by the step itself plus H2D of S frames.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaze_tpu.core.config import PipelineConfig
from gaze_tpu.models.pipeline import GazePipeline, StreamState


class StreamServer:
    """Stateful server over a fixed pool of video streams."""

    def __init__(
        self,
        config: PipelineConfig,
        variables,
        max_streams: int,
        dtype=jnp.float32,
        keep_heatmaps: bool = False,
        fixation_source: str = "idt",
        idt_dispersion_px: float = 8.0,
        idt_window: int = 3,
        quant_sp=None,
        at_pool: str = "sp_argmax",
        decoder_impl: str = "deconv",
        quant_conv: str = "xla",
        mesh=None,
    ):
        """Args (beyond the obvious):

        fixation_source: what drives the AT LSTM's fixation gating when a
          tick supplies no fixation bits (an explicit ``fixations`` arg
          always wins):
          - "idt": online I-DT dispersion detection on each stream's own
            predicted gaze track (the serving-time analogue of
            ``data/fixation.py``) — a new fixation after a saccade fires
            an LSTM onset, so attention keeps updating for the stream's
            lifetime.
          - "static": every frame flagged as fixation. The pipeline
            gates the LSTM on fixation *onset* (fix * (1 - prev_fix)), so
            this mode advances the LSTM exactly once per stream and the
            attention weights stay frozen afterwards — a deliberate
            "static attention" ablation, named for what it does.
            ("always" is accepted as a deprecated alias and warns.)
        idt_dispersion_px: max (x-extent + y-extent) of a fixation window,
          in model-grid pixels (default tuned for 224x224; data/fixation.py
          uses 25 px at 960-wide native resolution, 25 * 224/960 ~ 6-8 px).
        idt_window: trailing predicted-gaze frames a fixation must span.
        quant_sp: optional models.quant.QuantSP — serve the calibrated
          int8 VGG streams (see GazePipeline.quant_sp).
        at_pool: AT pooling point at fixation onsets — "sp_argmax"
          (default) or "prediction" (self-tracking; see GazePipeline).
        decoder_impl: SP decoder tail — "deconv" (canonical) or
          "pixelshuffle" (exact polyphase serving form,
          models/decode_fast.py).
        mesh: optional ``jax.sharding.Mesh`` (1-D data mesh,
          parallel/mesh.make_mesh) — multi-chip serving: the stream pool
          shards over the mesh's data axis (``max_streams`` must divide
          evenly), recurrent state stays device-resident SHARDED between
          ticks, and weights replicate. Each stream is independent, so
          the per-tick program needs zero cross-chip collectives — the
          scaling is embarrassingly parallel over ICI-attached chips and
          per-tick latency stays that of a single chip's shard.
        """
        if fixation_source == "always":
            import warnings

            warnings.warn(
                'fixation_source="always" advances the LSTM exactly once '
                "per stream (onset gating) — renamed to the self-describing "
                '"static"; the "always" alias will be removed.',
                DeprecationWarning,
                stacklevel=2,
            )
            fixation_source = "static"
        if fixation_source not in ("idt", "static"):
            raise ValueError(f"unknown fixation_source {fixation_source!r}")
        self.pipeline = GazePipeline(
            config, dtype=dtype, quant_sp=quant_sp, at_pool=at_pool,
            decoder_impl=decoder_impl, quant_conv=quant_conv,
        )
        self.mesh = mesh
        self._bsh = self._rep = None
        if mesh is not None:
            from gaze_tpu.parallel.mesh import batch_sharding, replicated

            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            if max_streams % n_dev:
                raise ValueError(
                    f"max_streams={max_streams} must divide evenly over the "
                    f"{n_dev}-device mesh (static per-device shard shapes)"
                )
            self._bsh, self._rep = batch_sharding(mesh), replicated(mesh)
            variables = jax.device_put(variables, self._rep)
        self.variables = variables
        self.max_streams = max_streams
        self.keep_heatmaps = keep_heatmaps
        self.fixation_source = fixation_source
        self._idt_dispersion = idt_dispersion_px
        self._idt_window = idt_window

        # One fused per-tick program: pipeline step + the first-frame
        # state revert (streams without a previous frame keep their
        # fresh state — their first pair's flow is garbage). Merging
        # inside the jit saves a round of eager dispatches per tick and,
        # under a mesh, keeps every tensor batch-sharded end to end.
        # State is deliberately NOT donated: tick() still holds the
        # pre-step state as an operand alias on the host side.
        # Quantized weights are jit OPERANDS (replicated under a mesh),
        # not program constants — see pipeline.quant_as_operand: ~30 MB
        # of int8 kernels inlined as literals make serving cold-start
        # compiles several times slower through a remote compile service.
        import dataclasses
        import functools

        from gaze_tpu.models.pipeline import quant_as_operand

        template, qsp = quant_as_operand(self.pipeline)

        def _fused(qsp, variables, state, prev_u8, cur_u8, fixation, first):
            p = (template if qsp is None
                 else dataclasses.replace(template, quant_sp=qsp))
            new_state, out = p.step(variables, state, prev_u8, cur_u8, fixation)

            def keep_old(new, old):
                m = first.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(m, old, new)

            merged = jax.tree_util.tree_map(keep_old, new_state, state)
            return merged, out

        if mesh is None:
            if qsp is None:
                self._step = functools.partial(jax.jit(_fused), None)
            else:
                # AOT with compiler-chosen (AUTO) layouts for the weight
                # operands, device_put into that layout ONCE: operand-
                # passed weights otherwise pay a per-tick layout
                # conversion — measured 5% of the fused step on v5e
                # (54.15 ms inline constants, 56.91 ms plain operands,
                # 54.13 ms operands+AUTO — docs/STATUS.md round-5).
                # Shapes are fixed at construction, so one executable
                # serves the server's lifetime.
                self._step = self._aot_quant_step(_fused, qsp)
        else:
            bsh, rep = self._bsh, self._rep
            if qsp is not None:
                qsp = jax.device_put(qsp, rep)
            self._step = functools.partial(
                jax.jit(
                    _fused,
                    in_shardings=(rep, rep, bsh, bsh, bsh, bsh, bsh),
                    out_shardings=(bsh, bsh),
                ),
                qsp,
            )
        h, w = config.image.height, config.image.width
        self._state = self._put(self.pipeline.init_state(max_streams))
        self._prev = self._put(jnp.zeros((max_streams, h, w, 3), jnp.uint8))
        self._active = np.zeros((max_streams,), bool)
        self._seen_first = np.zeros((max_streams,), bool)
        # Trailing predicted-gaze window for online I-DT (NaN = no sample).
        self._gaze_hist = np.full((max_streams, idt_window, 2), np.nan, np.float32)
        # submit() pipeline: the frame whose H2D is in flight + its bits.
        self._pending = None
        self._pending_fix = None
        # Result of a pipeline drain forced by attach()/detach(); handed
        # to the caller on its next submit() so the one-result-per-submit
        # cadence holds.
        self._stash = None

    def _drain_pending(self):
        """attach/detach during an in-flight submit(): the pending frame
        was captured under the OLD slot bookkeeping, so process it
        BEFORE mutating — otherwise the stale frame's tick consumes the
        new stream's reset/first bits and its next real first frame
        pairs with an unrelated prev frame (garbage flow reported as a
        valid gaze)."""
        if self._pending is not None:
            self._stash = self.flush()

    @staticmethod
    def _aot_quant_step(fused, qsp):
        """Lazy AOT wrapper for the quantized fused step: first call
        lowers+compiles with ``Format(Layout.AUTO)`` on the weight
        operand subtree, then device_puts the weights into the layout
        the compiler chose (leaf-by-leaf) and verifies with one real
        execution. Later calls reuse the executable (tick shapes are
        fixed by ``max_streams``).

        If the backend does not honor format-targeted device_put (seen
        on the axon relay for some kernel shapes: the transferred layout
        disagreed with the requested one), the first call raises a
        layout-mismatch ValueError — we then fall back to the plain
        operand jit, which costs a per-tick weight layout conversion
        (~5% of the fused step on v5e) but is always correct.
        """
        import warnings

        holder: Dict[str, Any] = {}

        def call(variables, state, prev_u8, cur_u8, fixation, first):
            if "fallback" in holder:
                return holder["fallback"](
                    variables, state, prev_u8, cur_u8, fixation, first
                )
            if "exec" not in holder:
                try:
                    from jax.experimental.layout import Format, Layout

                    auto = jax.tree_util.tree_map(
                        lambda _: Format(Layout.AUTO), qsp
                    )
                    jf = jax.jit(fused, in_shardings=(auto,) + (None,) * 6)
                    compiled = jf.lower(
                        qsp, variables, state, prev_u8, cur_u8, fixation,
                        first,
                    ).compile()
                    # Relayout ON DEVICE via a jitted identity whose
                    # output formats are the executable's input formats:
                    # a plain device_put(x, Format) does not reliably
                    # honor the requested layout through the axon relay
                    # transport (the transferred array keeps another
                    # layout and the AOT call rejects it).
                    relayout = jax.jit(
                        lambda t: t,
                        out_shardings=compiled.input_formats[0][0],
                    )
                    qdev = relayout(qsp)
                    result = compiled(
                        qdev, variables, state, prev_u8, cur_u8, fixation,
                        first,
                    )
                    holder["exec"], holder["qsp"] = compiled, qdev
                    return result
                except Exception as e:  # layout mismatch / AOT quirk
                    warnings.warn(
                        "AOT AUTO-layout quant step unavailable on this "
                        f"backend ({type(e).__name__}: {str(e)[:200]}) — "
                        "falling back to the plain operand jit "
                        "(~5% slower per tick on v5e)."
                    )
                    import functools

                    holder["fallback"] = functools.partial(
                        jax.jit(fused), qsp
                    )
                    return holder["fallback"](
                        variables, state, prev_u8, cur_u8, fixation, first
                    )
            try:
                return holder["exec"](
                    holder["qsp"], variables, state, prev_u8, cur_u8,
                    fixation, first,
                )
            except Exception as e:
                # A LATER tick can still hit backend layout quirks: an
                # eager attach()-time state rebuild may come back in a
                # layout the cached executable rejects (the same relay
                # behavior the first-call guard covers). Fall back for
                # the server's remaining lifetime rather than crash a
                # live serving loop.
                warnings.warn(
                    "AOT quant step failed after first tick "
                    f"({type(e).__name__}: {str(e)[:200]}) — switching to "
                    "the plain operand jit."
                )
                import functools

                holder["fallback"] = functools.partial(jax.jit(fused), qsp)
                return holder["fallback"](
                    variables, state, prev_u8, cur_u8, fixation, first
                )

        return call

    def _put(self, tree):
        """Device-put a (batch-leading) pytree, sharded when meshed."""
        if self._bsh is None:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        return jax.device_put(tree, self._bsh)

    # ------------------------------------------------------- control ----
    def attach(self, slot: int) -> None:
        """Claim a stream slot; its recurrent state starts fresh."""
        self._drain_pending()
        self._active[slot] = True
        self._seen_first[slot] = False
        self._gaze_hist[slot] = np.nan
        self._reset_slot(slot)

    def detach(self, slot: int) -> None:
        self._drain_pending()
        self._active[slot] = False

    def active_slots(self) -> np.ndarray:
        return np.flatnonzero(self._active)

    def _idt_labels(self) -> np.ndarray:
        """Per-slot fixation bits from the trailing predicted-gaze window.

        A slot is "in fixation" when its last ``idt_window`` predictions
        exist and their dispersion (x-extent + y-extent, the I-DT measure
        of ``data/fixation.py``) stays under the threshold. The pipeline's
        onset gating (fix * (1 - prev_fix)) then advances the LSTM exactly
        once per detected fixation — the §3.4 "if new fixation" semantics
        without an external eye-tracker stream.
        """
        g = self._gaze_hist
        full = ~np.isnan(g).any(axis=(1, 2))
        ext = np.nan_to_num(g.max(axis=1) - g.min(axis=1), nan=np.inf)
        disp = ext[:, 0] + ext[:, 1]
        return (full & (disp <= self._idt_dispersion)).astype(np.float32)

    def _reset_slot(self, slot: int) -> None:
        fresh = self.pipeline.init_state(1)

        def put(cur, new):
            return cur.at[slot : slot + 1].set(new)

        self._state = jax.tree_util.tree_map(put, self._state, fresh)
        if self._bsh is not None:
            # The eager slot update leaves XLA-chosen shardings; pin the
            # state back to the batch sharding the tick program expects
            # (attach/detach is rare — reshard cost is off the hot path).
            self._state = jax.device_put(self._state, self._bsh)

    # ---------------------------------------------------------- tick ----
    def tick(
        self, frames: np.ndarray, fixations: Optional[np.ndarray] = None
    ) -> Dict[str, np.ndarray]:
        """Advance every active stream by one frame.

        Args:
          frames: (max_streams, H, W, 3) uint8 — current frame per slot
            (inactive slots' content is ignored).
          fixations: optional (max_streams,) fixation bits; when None the
            server derives them per ``fixation_source`` (online I-DT on
            the predicted gaze track by default — self-running mode when
            no eye-tracker segmentation stream exists).

        Returns:
          dict with "gaze" (S, 2) float32 and, when keep_heatmaps,
          "heatmap"/"saliency"/"attention" (S, H, W). Slots seeing their
          first frame return gaze (-1, -1) (no frame pair for flow yet).
        """
        if fixations is None:
            if self.fixation_source == "idt":
                fixations = self._idt_labels()
            else:  # "static" — static-attention mode (one LSTM onset ever)
                fixations = np.ones((self.max_streams,), np.float32)
        cur = self._put(frames)
        fix = self._put(
            np.asarray(fixations, np.float32)
            * np.asarray(self._active, np.float32)
        )
        # Streams without a previous frame keep their fresh state — the
        # flow for their first pair is garbage (prev is zeros); the
        # revert happens inside the fused step program.
        first_np = ~self._seen_first & self._active
        self._state, out = self._step(
            self.variables, self._state, self._prev, cur, fix,
            self._put(first_np),
        )
        self._prev = cur

        gaze = np.array(out["gaze"])  # owned copy (np.asarray is read-only)
        gaze[first_np] = -1.0
        gaze[~self._active] = -1.0
        self._seen_first |= self._active

        # Slide the I-DT window: sentinel/inactive frames stay NaN so they
        # can never complete a fixation window.
        self._gaze_hist = np.roll(self._gaze_hist, -1, axis=1)
        self._gaze_hist[:, -1] = np.where(gaze[:, :1] < 0, np.nan, gaze)

        result = {"gaze": gaze}
        if self.keep_heatmaps:
            for k in ("heatmap", "saliency", "attention"):
                result[k] = np.asarray(out[k])
        return result

    def submit(self, frames: np.ndarray, fixations: Optional[np.ndarray] = None):
        """Pipelined tick: overlap this frame's H2D with the previous
        frame's compute.

        ``submit(f_t)`` starts the (async) host-to-device transfer of
        ``f_t``, then advances every stream by the frame submitted on the
        PREVIOUS call (already device-resident) and returns its results —
        i.e. results lag one submit. Returns None on the first call.

        Why: a tick must wait for its own 19 MB (at 128 streams) H2D
        before computing; the one-frame pipeline hides the transfer
        behind the previous frame's step, which is how a production host
        keeps PCIe and the chip busy simultaneously.
        """
        new_dev = self._put(frames)  # async H2D (sharded when meshed)
        result = self._stash  # a drain forced by attach()/detach()
        self._stash = None
        if self._pending is not None:
            result = self.tick(self._pending, self._pending_fix)
        self._pending = new_dev
        self._pending_fix = fixations
        return result

    def flush(self):
        """Drain the submit() pipeline: process the last pending frame."""
        if self._pending is None:
            return None
        result = self.tick(self._pending, self._pending_fix)
        self._pending = None
        self._pending_fix = None
        return result


class DistributedStreamServer:
    """Multi-HOST serving: one stream pool sharded over a global mesh
    spanning every process's chips (``core.distributed.global_mesh``).

    Each process owns a contiguous block of ``streams_per_host`` slots:
    it feeds ONLY its local frames per tick and reads back ONLY its
    local gaze — per-host I/O, exactly like the training input pipeline
    (``host_sharded_array``). The per-tick compiled program is SPMD
    (every process must call :meth:`tick` in lockstep) but contains
    ZERO cross-chip collectives — streams are independent, so scaling
    over ICI+DCN-attached hosts is embarrassingly parallel with
    single-chip per-tick latency.

    Design constraint vs :class:`StreamServer`: a multi-process global
    array cannot be updated eagerly from one process (every eager op on
    it is itself SPMD-collective), so slot resets CANNOT be host-side
    ``.at[slot].set`` calls. Instead ``attach`` marks a pending-reset
    bit and the fused tick program selects fresh-vs-carried state per
    slot from a (S,) reset mask — pure data, no per-process program
    divergence. Quantized weights ride as replicated jit operands
    (``quant_as_operand``); the AOT AUTO-layout fast path is a
    single-process optimization and is not used here.

    Degrades cleanly to single-process (process_count()==1), where it
    is numerically identical to :class:`StreamServer` with the same
    pool size (pinned in tests/test_serve_distributed.py).
    """

    def __init__(
        self,
        config: PipelineConfig,
        variables,
        streams_per_host: int,
        mesh=None,
        dtype=jnp.float32,
        keep_heatmaps: bool = False,
        fixation_source: str = "idt",
        idt_dispersion_px: float = 8.0,
        idt_window: int = 3,
        quant_sp=None,
        at_pool: str = "sp_argmax",
        decoder_impl: str = "deconv",
        quant_conv: str = "xla",
    ):
        import dataclasses
        import functools

        from gaze_tpu.core.distributed import global_mesh, host_sharded_array
        from gaze_tpu.models.pipeline import quant_as_operand
        from gaze_tpu.parallel.mesh import batch_sharding, replicated

        if fixation_source not in ("idt", "static"):
            raise ValueError(f"unknown fixation_source {fixation_source!r}")
        self.pipeline = GazePipeline(
            config, dtype=dtype, quant_sp=quant_sp, at_pool=at_pool,
            decoder_impl=decoder_impl, quant_conv=quant_conv,
        )
        self.mesh = mesh if mesh is not None else global_mesh()
        self.n_proc = jax.process_count()
        self.rank = jax.process_index()
        self.s_local = int(streams_per_host)
        self.max_streams = self.s_local * self.n_proc
        n_dev = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
        if self.max_streams % n_dev:
            raise ValueError(
                f"global pool {self.max_streams} (= {streams_per_host} x "
                f"{self.n_proc} hosts) must divide evenly over the "
                f"{n_dev}-device mesh"
            )
        self.keep_heatmaps = keep_heatmaps
        self.fixation_source = fixation_source
        self._idt_dispersion = idt_dispersion_px
        self._idt_window = idt_window
        self._host_shard = functools.partial(host_sharded_array, mesh=self.mesh)

        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)

        def rep_put(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    rep, np.asarray(x)
                ),
                tree,
            )

        self.variables = rep_put(variables)
        template, qsp = quant_as_operand(self.pipeline)
        if qsp is not None:
            qsp = rep_put(qsp)
        S = self.max_streams

        def _fused(qsp, variables, state, prev_u8, cur_u8, fixation, first,
                   reset):
            p = (template if qsp is None
                 else dataclasses.replace(template, quant_sp=qsp))
            # Per-slot reset INSIDE the program (see class docstring):
            # fresh state values are trace-time constants.
            fresh = p.init_state(S)

            def sel(mask):
                def f(a, b):
                    m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
                    return jnp.where(m, a, b)

                return f

            state = jax.tree_util.tree_map(
                lambda f, s: sel(reset)(f, s), fresh, state
            )
            new_state, out = p.step(variables, state, prev_u8, cur_u8,
                                    fixation)
            # First-frame revert: slots whose pair has no real previous
            # frame keep their (possibly just reset) state.
            merged = jax.tree_util.tree_map(
                lambda new, old: sel(first)(old, new), new_state, state
            )
            return merged, out

        self._step = functools.partial(
            jax.jit(
                _fused,
                in_shardings=(rep, rep, bsh, bsh, bsh, bsh, bsh, bsh),
                out_shardings=(bsh, bsh),
            ),
            qsp,
        )

        h, w = config.image.height, config.image.width
        self._state = jax.tree_util.tree_map(
            lambda x: self._host_shard(np.asarray(x)),
            self.pipeline.init_state(self.s_local),
        )
        self._prev = self._host_shard(
            np.zeros((self.s_local, h, w, 3), np.uint8)
        )
        # All bookkeeping is per-LOCAL-slot, per-process.
        self._active = np.zeros((self.s_local,), bool)
        self._seen_first = np.zeros((self.s_local,), bool)
        self._reset_pending = np.zeros((self.s_local,), bool)
        self._gaze_hist = np.full(
            (self.s_local, idt_window, 2), np.nan, np.float32
        )
        self._pending = None
        self._pending_fix = None
        self._stash = None

    def _drain_pending(self):
        """See StreamServer._drain_pending — same submit-pipeline hazard.
        SPMD note: attach/detach are per-host decisions, but a drain
        issues a tick, which is COLLECTIVE — callers on every process
        must keep their tick/submit/attach sequences aligned (the same
        discipline tick() itself already requires)."""
        if self._pending is not None:
            self._stash = self.flush()

    # ------------------------------------------------------- control ----
    def attach(self, local_slot: int) -> None:
        """Claim one of THIS host's slots; its state resets on next tick."""
        self._drain_pending()
        self._active[local_slot] = True
        self._seen_first[local_slot] = False
        self._reset_pending[local_slot] = True
        self._gaze_hist[local_slot] = np.nan

    def detach(self, local_slot: int) -> None:
        self._drain_pending()
        self._active[local_slot] = False

    def active_slots(self) -> np.ndarray:
        return np.flatnonzero(self._active)

    def _idt_labels(self) -> np.ndarray:
        g = self._gaze_hist
        full = ~np.isnan(g).any(axis=(1, 2))
        ext = np.nan_to_num(g.max(axis=1) - g.min(axis=1), nan=np.inf)
        disp = ext[:, 0] + ext[:, 1]
        return (full & (disp <= self._idt_dispersion)).astype(np.float32)

    def _local(self, global_arr) -> np.ndarray:
        """This process's contiguous rows of a batch-sharded global array."""
        shards = sorted(
            global_arr.addressable_shards,
            key=lambda s: s.index[0].start or 0,
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    # ---------------------------------------------------------- tick ----
    def tick(
        self, frames: np.ndarray, fixations: Optional[np.ndarray] = None
    ) -> Dict[str, np.ndarray]:
        """Advance every stream by one frame. SPMD-COLLECTIVE: every
        process must call tick() the same number of times with the same
        shapes (contents are per-host).

        Args:
          frames: (streams_per_host, H, W, 3) uint8 — THIS host's frames.
          fixations: optional (streams_per_host,) bits for this host.

        Returns: dict with "gaze" (streams_per_host, 2) for THIS host's
        slots (+ local heatmaps when keep_heatmaps).
        """
        if fixations is None:
            if self.fixation_source == "idt":
                fixations = self._idt_labels()
            else:
                fixations = np.ones((self.s_local,), np.float32)
        fix = (np.asarray(fixations, np.float32)
               * self._active.astype(np.float32))
        first_np = ~self._seen_first & self._active
        reset_np = self._reset_pending.copy()
        self._reset_pending[:] = False

        cur = self._ensure_global(frames)
        self._state, out = self._step(
            self.variables, self._state, self._prev, cur,
            self._host_shard(fix), self._host_shard(first_np),
            self._host_shard(reset_np),
        )
        self._prev = cur

        gaze = self._local(out["gaze"]).copy()
        gaze[first_np] = -1.0
        gaze[~self._active] = -1.0
        self._seen_first |= self._active

        self._gaze_hist = np.roll(self._gaze_hist, -1, axis=1)
        self._gaze_hist[:, -1] = np.where(gaze[:, :1] < 0, np.nan, gaze)

        result = {"gaze": gaze}
        if self.keep_heatmaps:
            for k in ("heatmap", "saliency", "attention"):
                result[k] = self._local(out[k])
        return result

    def _ensure_global(self, frames):
        """Local (S_local, H, W, 3) host frames -> global sharded array
        (pass-through when already assembled, e.g. by submit())."""
        if isinstance(frames, jax.Array):
            return frames
        return self._host_shard(
            np.ascontiguousarray(frames).astype(np.uint8, copy=False)
        )

    def submit(self, frames: np.ndarray, fixations: Optional[np.ndarray] = None):
        """Pipelined tick (see StreamServer.submit): starts this frame's
        per-host H2D + global assembly, then advances every stream by
        the PREVIOUSLY submitted frame and returns its local results
        (None on the first call). SPMD-collective like tick()."""
        new_dev = self._ensure_global(frames)
        result = self._stash  # a drain forced by attach()/detach()
        self._stash = None
        if self._pending is not None:
            result = self.tick(self._pending, self._pending_fix)
        self._pending = new_dev
        self._pending_fix = fixations
        return result

    def flush(self):
        """Drain the submit() pipeline: process the last pending frame."""
        if self._pending is None:
            return None
        result = self.tick(self._pending, self._pending_fix)
        self._pending = None
        self._pending_fix = None
        return result
