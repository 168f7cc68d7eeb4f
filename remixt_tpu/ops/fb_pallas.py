"""Pallas TPU forward-backward kernel for the chain-batched scan.

The lax.scan path (ops/fb_scan.py) gathers a (Q, S, S) transition slab from
HBM every step — ~2·N·S² floats per sweep — even though ~90% of lanes use
one of a handful of class matrices. This kernel keeps the static matrices
(telomere cut + class pairs) resident in VMEM and DMAs only the per-breakend
matrices on the steps that need them (a precomputed compact schedule),
reducing transition traffic per sweep from ~2·N·S² to ~2·2K·S².

Numerics match fb_scan's real-space semiring: transition log-weights are
<= 0 so exp-weights lie in [0, 1]; per-lane max shift; sums floored at the
f32 tiny threshold so unreachable states clamp ~85 nats below the lane
maximum (below posterior precision) instead of producing -inf/NaN chains.

Layout: S padded to a lane multiple (128), Q padded to a sublane multiple
(8). Pad states carry frame = NEG and zero transition weight; pad lanes are
cut chains with zero frames. Per-lane class selection streams as a one-hot
plane (channel capacity 128 classes); breakend (step, lane, slot) triples
stream through scalar-prefetch SMEM.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from remixt_tpu.ops.special import MM_PRECISION_PALLAS

NEG = -1e30
TINY = 1e-37
CLS_CHANNELS = 128
# channel of the streamed class plane carrying the per-(step, lane) frame
# max shift for the scaled-linear kernels (static classes use 0..126)
FMAX_CH = CLS_CHANNELS - 1

# Grouped-kernel tuning knobs (read once at import; ablation probes flip
# these via env before picking new defaults — see ABLATION.json).
#   fix-up batched matvec: VPU multiply-reduce (1) vs R serial MXU dots (0);
#   measured grids picked VPU (bit-identical output; +2.6%/+7.8%
#   single/batched in round 2, +1.0%/+8.1% in the round-3 pre-pipeline
#   grid, v5e at N=6000/S=355/R=12; ABLATION.json holds the LATEST grid)
GROUPED_FIXUP_VPU = os.environ.get('REMIXT_TPU_FIXUP_VPU', '1') == '1'
#   junction-slab double-buffer depth (VMEM: slots * R * Sp^2 floats)
GROUPED_NUM_SLOTS = int(os.environ.get('REMIXT_TPU_GROUPED_SLOTS', '2'))
#   unroll the grouped fix-up over scratch slots so every slab access has
#   a STATIC leading index (fault bisect: the dynamic-leading-index 3D
#   slab read is the op unique to the faulting VPU-fixup + slots>1
#   combination at R=10/R=4 — tools/repro_grouped_fault.py)
GROUPED_STATIC_SLOT = os.environ.get('REMIXT_TPU_STATIC_SLOT', '0') == '1'
#   per-matrix breakend scratch depth in the restart-tiled/single kernels
TILED_NUM_SLOTS = int(os.environ.get('REMIXT_TPU_TILED_SLOTS', '8'))
#   scaled-linear-space recursion (classic scaled HMM): carry stays in
#   max-normalized linear space with a per-lane log-scale accumulator,
#   replacing the per-step exp/log planes with one max-reduce and a
#   (lanes, 1) log. MEASURED A NET LOSS on hardware (ABLATION.json:
#   -0.4% single-restart, -1.3% restart-batched vs the log-space
#   kernels, and posterior max-abs-diff 1.2e-4 vs 7e-10) — the step
#   budget is dominated by fixed per-grid-step overhead and junction
#   DMA traffic, not the transcendental planes, and the scaled variant
#   adds frame multiplies + scale-column writes. Kept as an ablation
#   knob; the log-space kernels are the default.
SCALED_LINEAR = os.environ.get('REMIXT_TPU_SCALED_LINEAR', '0') == '1'
for _name, _val in (('REMIXT_TPU_GROUPED_SLOTS', GROUPED_NUM_SLOTS),
                    ('REMIXT_TPU_TILED_SLOTS', TILED_NUM_SLOTS)):
    if _val < 1:
        raise ValueError('%s must be >= 1, got %d' % (_name, _val))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def build_pallas_plan(chain_bank_idx_np, num_static_bank, Q, L, S):
    """Host-side kernel schedule.

    Returns dict with padded dims, the streamed one-hot class plane
    (L, Qp, 128) (step t's pair between positions t and t+1 lives at row
    t+1, aligning with the kernel's grid), and the compact breakend schedule
    (step_row, k) -> (lane, breakend index), -1 padded.
    """
    Sp = _round_up(S, 128)
    if SCALED_LINEAR and Sp == S:
        Sp += 128   # the scaled kernel stores the log scale in a pad column
    Qp = _round_up(max(Q, 8), 8)
    nsteps = max(L - 1, 1)

    cls_idx = chain_bank_idx_np.T.copy()  # (L-1, Q) step-major
    is_be = cls_idx >= num_static_bank
    be_slot = np.where(is_be, cls_idx - num_static_bank, 0)
    cls_idx = np.where(is_be, 0, cls_idx)
    if num_static_bank > CLS_CHANNELS - 1:
        # channel FMAX_CH is reserved for the scaled-linear frame shift
        raise ValueError('too many static transition classes for the kernel')

    # one-hot class plane, rows aligned to grid position t = step + 1
    cls_onehot = np.zeros((L, Qp, CLS_CHANNELS), dtype=np.float32)
    for t in range(1, L):
        for q in range(Q):
            cls_onehot[t, q, cls_idx[t - 1, q]] = 1.0
        cls_onehot[t, Q:, 0] = 1.0  # pad lanes: cut
    cls_onehot[0, :, 0] = 1.0

    steps, lanes = np.nonzero(is_be)
    kmax = int(np.bincount(steps, minlength=1).max()) if len(steps) else 1
    kmax = max(kmax, 1)
    # schedule laid out (kmax, L) so SMEM tile padding hits the small axis;
    # columns aligned to grid position t = step + 1 (column 0 unused)
    sched_lane = -np.ones((kmax, L), dtype=np.int32)
    sched_slot = np.zeros((kmax, L), dtype=np.int32)
    fill = np.zeros(L, dtype=np.int32)
    for t, q in zip(steps, lanes):
        col = t + 1
        sched_lane[fill[col], col] = q
        sched_slot[fill[col], col] = be_slot[t, q]
        fill[col] += 1

    return dict(Sp=Sp, Qp=Qp, kmax=kmax, cls_onehot=cls_onehot,
                sched_lane=sched_lane, sched_slot=sched_slot)


def _flat_schedule(sched_lane, sched_slot):
    """Flatten a (kmax, L) column schedule into global junction order.

    Returns (g0 (L+1,), jl (max(G,1),), js (max(G,1),), G): junction g's
    lane/slot are jl[g]/js[g]; column t's junctions are g0[t] <= g <
    g0[t+1]. The kernels pipeline junction DMAs in this global order —
    junction g's fetch is issued when junction g - num_slots is applied
    (and the first num_slots at grid step 0), so a fetch leads its use
    by ~num_slots junctions ACROSS column boundaries instead of being
    issued at the top of its own column (where only the static dot hides
    its latency; junction-DMA stalls dominated the kernel step budget).
    """
    kmax, L = sched_lane.shape
    jl, js = [], []
    g0 = np.zeros(L + 1, dtype=np.int32)
    for t in range(L):
        for k in range(kmax):
            if sched_lane[k, t] >= 0:
                jl.append(sched_lane[k, t])
                js.append(sched_slot[k, t])
        g0[t + 1] = len(jl)
    G = len(jl)
    jl = np.asarray(jl or [0], dtype=np.int32)
    js = np.asarray(js or [0], dtype=np.int32)
    return g0, jl, js, G


def _fb_kernel_wrapped(g0_ref, jl_ref, js_ref,
                       frame_ref, cls_ref, static_exp_ref, be_exp_ref,
                       out_ref, carry_ref, be_scratch, sems,
                       *, kmax, num_static, reverse, num_slots, G):
    """One grid step = one chain position; VMEM scratch carries the running
    message. Resident-class result first, then breakend lane fix-ups in
    global junction order (_flat_schedule): junction g occupies scratch
    slot g % num_slots, its DMA issued when junction g - num_slots was
    applied — a rolling pipeline ~num_slots junctions deep that crosses
    column boundaries."""
    t = pl.program_id(0)
    Qp = carry_ref.shape[0]

    def _fetch(g, slot):
        pltpu.make_async_copy(
            be_exp_ref.at[js_ref[g]], be_scratch.at[slot],
            sems.at[slot]).start()

    @pl.when(t == 0)
    def _init():
        if reverse:
            carry_ref[:, :] = jnp.zeros_like(carry_ref)
            out_ref[0, :, :] = jnp.zeros_like(carry_ref)
        else:
            carry_ref[:, :] = frame_ref[0, :, :]
            out_ref[0, :, :] = frame_ref[0, :, :]
        for k in range(min(num_slots, G)):
            _fetch(k, k)

    @pl.when(t > 0)
    def _step():
        if reverse:
            carry = carry_ref[:, :] + frame_ref[0, :, :]
        else:
            carry = carry_ref[:, :]

        cmax = jnp.max(carry, axis=-1, keepdims=True)
        u = jnp.exp(carry - cmax)

        # class selection happens on the LINEAR sums: elementwise
        # log/max(TINY) commutes with the lane-select, so one log plane at
        # the end replaces num_static of them (bit-identical output)
        s_sel = jnp.broadcast_to(
            jnp.sum(u, axis=-1, keepdims=True), u.shape)   # cut class

        for c in range(1, num_static):
            mat = static_exp_ref[c, :, :]
            if reverse:
                s = jnp.dot(u, mat.T, preferred_element_type=jnp.float32,
                            precision=MM_PRECISION_PALLAS)
            else:
                s = jnp.dot(u, mat, preferred_element_type=jnp.float32,
                            precision=MM_PRECISION_PALLAS)
            lane_is_c = cls_ref[0, :, c:c + 1] > 0.5
            s_sel = jnp.where(lane_is_c, s, s_sel)

        result = jnp.log(jnp.maximum(s_sel, TINY)) + cmax

        if reverse:
            out_ref[0, :, :] = result
            carry_ref[:, :] = result
        else:
            out_val = result + frame_ref[0, :, :]
            out_ref[0, :, :] = out_val
            carry_ref[:, :] = out_val

        g_lo = g0_ref[t]
        g_hi = g0_ref[t + 1]
        for k in range(kmax):

            @pl.when(g_lo + k < g_hi)
            def _apply(k=k):
                g = g_lo + k
                slot = jax.lax.rem(g, np.int32(num_slots))
                lane = jl_ref[g]
                pltpu.make_async_copy(
                    be_exp_ref.at[js_ref[g]], be_scratch.at[slot],
                    sems.at[slot]).wait()
                onehot = (jax.lax.broadcasted_iota(jnp.int32, (Qp, 1), 0)
                          == lane)
                u_lane = jnp.sum(jnp.where(onehot, u, 0.0),
                                 axis=0, keepdims=True)
                cmax_lane = jnp.sum(jnp.where(onehot, cmax, 0.0),
                                    axis=0, keepdims=True)
                if reverse:
                    s = jnp.dot(u_lane, be_scratch[slot, :, :].T,
                                preferred_element_type=jnp.float32,
                                precision=MM_PRECISION_PALLAS)
                else:
                    s = jnp.dot(u_lane, be_scratch[slot, :, :],
                                preferred_element_type=jnp.float32,
                                precision=MM_PRECISION_PALLAS)
                val = jnp.log(jnp.maximum(s, TINY)) + cmax_lane
                if reverse:
                    fixed = jnp.broadcast_to(val, carry_ref.shape)
                else:
                    fixed = jnp.broadcast_to(
                        val, carry_ref.shape) + frame_ref[0, :, :]
                out_ref[0, :, :] = jnp.where(onehot, fixed, out_ref[0, :, :])
                carry_ref[:, :] = jnp.where(onehot, fixed, carry_ref[:, :])

                # the slot just read is free: refill it with the junction
                # num_slots ahead (same slot by construction)
                @pl.when(g + num_slots < G)
                def _refill():
                    _fetch(g + num_slots, slot)


def _fb_kernel_scaled(g0_ref, jl_ref, js_ref,
                      frame_ref, cls_ref, static_exp_ref, be_exp_ref,
                      out_ref, carry_ref, scale_ref, be_scratch, sems,
                      *, kmax, num_static, reverse, num_slots, scale_col, G):
    """Scaled-linear-space variant of _fb_kernel_wrapped (classic scaled-HMM
    recursion — a new formulation here, not a reference port: the
    reference's sum_product, bpmodel.pyx:1213-1246, is log-space with a
    per-step logsumexp).

    The carry stays in per-lane max-normalized LINEAR space with a log-scale
    accumulator in scratch, so the serial step spends no full-plane
    exp/log — only the MXU dots, one max-reduce and a (Qp, 1)-sized
    log/reciprocal. frame_ref holds exp(frame - fmax) (shifted outside);
    the shift fmax rides channel FMAX_CH of the class plane. The output
    block carries u in the state columns and the lane's log scale in pad
    state column ``scale_col``; log messages are reconstructed outside as
    log(max(u, TINY)) + scale, reproducing the log-space kernel's TINY
    clamp ~85 nats below the lane maximum.
    """
    t = pl.program_id(0)
    Qp = carry_ref.shape[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, carry_ref.shape, 1)

    def _fetch(g, slot):
        pltpu.make_async_copy(
            be_exp_ref.at[js_ref[g]], be_scratch.at[slot],
            sems.at[slot]).start()

    @pl.when(t == 0)
    def _init():
        if reverse:
            u0 = jnp.ones_like(carry_ref)
            sc0 = jnp.zeros_like(scale_ref)
        else:
            u0 = frame_ref[0, :, :]
            sc0 = jnp.broadcast_to(
                cls_ref[0, :, FMAX_CH:FMAX_CH + 1], scale_ref.shape)
        carry_ref[:, :] = u0
        scale_ref[:, :] = sc0
        out_ref[0, :, :] = jnp.where(col_iota == scale_col, sc0[:, :1], u0)
        for k in range(min(num_slots, G)):
            _fetch(k, k)

    @pl.when(t > 0)
    def _step():
        u_prev = carry_ref[:, :]
        sc_prev = scale_ref[:, :]
        fmax_t = cls_ref[0, :, FMAX_CH:FMAX_CH + 1]      # (Qp, 1)
        frame_exp = frame_ref[0, :, :]

        # reverse folds the position's frame in BEFORE the contraction
        # (beta recursion); forward after. Pad state columns stay zero
        # through both (frame_exp is 0 there; bank pad rows/cols are 0).
        base = u_prev * frame_exp if reverse else u_prev

        s_sel = jnp.broadcast_to(
            jnp.sum(base, axis=-1, keepdims=True), base.shape)   # cut class
        for c in range(1, num_static):
            mat = static_exp_ref[c, :, :]
            if reverse:
                s = jnp.dot(base, mat.T, preferred_element_type=jnp.float32,
                            precision=MM_PRECISION_PALLAS)
            else:
                s = jnp.dot(base, mat, preferred_element_type=jnp.float32,
                            precision=MM_PRECISION_PALLAS)
            lane_is_c = cls_ref[0, :, c:c + 1] > 0.5
            s_sel = jnp.where(lane_is_c, s, s_sel)

        if not reverse:
            s_sel = s_sel * frame_exp

        m = jnp.maximum(jnp.max(s_sel, axis=-1, keepdims=True), TINY)
        u = s_sel * (1.0 / m)
        scale = sc_prev + jnp.log(m) + fmax_t

        out_ref[0, :, :] = jnp.where(col_iota == scale_col, scale[:, :1], u)
        carry_ref[:, :] = u
        scale_ref[:, :] = scale

        g_lo = g0_ref[t]
        g_hi = g0_ref[t + 1]
        for k in range(kmax):

            @pl.when(g_lo + k < g_hi)
            def _apply(k=k):
                g = g_lo + k
                slot = jax.lax.rem(g, np.int32(num_slots))
                lane = jl_ref[g]
                pltpu.make_async_copy(
                    be_exp_ref.at[js_ref[g]], be_scratch.at[slot],
                    sems.at[slot]).wait()
                onehot = (jax.lax.broadcasted_iota(jnp.int32, (Qp, 1), 0)
                          == lane)
                base_lane = jnp.sum(jnp.where(onehot, base, 0.0),
                                    axis=0, keepdims=True)
                mat = be_scratch[slot, :, :]
                if reverse:
                    s_l = jnp.dot(base_lane, mat.T,
                                  preferred_element_type=jnp.float32,
                                  precision=MM_PRECISION_PALLAS)
                else:
                    frame_l = jnp.sum(jnp.where(onehot, frame_exp, 0.0),
                                      axis=0, keepdims=True)
                    s_l = jnp.dot(base_lane, mat,
                                  preferred_element_type=jnp.float32,
                                  precision=MM_PRECISION_PALLAS) * frame_l
                m_l = jnp.maximum(jnp.max(s_l, axis=-1, keepdims=True), TINY)
                u_l = s_l * (1.0 / m_l)
                # per-lane (Qp, 1) scale update — exact at the masked row
                # (sc_prev/fmax rows ARE the lane's values there); avoids a
                # (1, 1) -> (Qp, Sp) both-axis broadcast Mosaic rejects
                scale_lane = sc_prev[:, :1] + jnp.log(m_l) + fmax_t
                u_full = jnp.broadcast_to(u_l, carry_ref.shape)
                patched = jnp.where(col_iota == scale_col, scale_lane, u_full)
                out_ref[0, :, :] = jnp.where(onehot, patched, out_ref[0, :, :])
                carry_ref[:, :] = jnp.where(onehot, u_full, carry_ref[:, :])
                scale_ref[:, :] = jnp.where(
                    onehot, jnp.broadcast_to(scale_lane, scale_ref.shape),
                    scale_ref[:, :])

                @pl.when(g + num_slots < G)
                def _refill():
                    _fetch(g + num_slots, slot)


def _scaled_to_log(tm_out):
    """Reconstruct log-space messages from a scaled-linear kernel output:
    state columns hold max-normalized u, the last column the log scale."""
    sc = tm_out[:, :, -1:]
    return jnp.log(jnp.maximum(tm_out, TINY)) + sc


def _run_direction(frame_tm, cls_onehot, static_exp, be_exp, plan, reverse,
                   interpret=False, fmax=None):
    """frame_tm: (L, Qp, Sp) time-major frame input for this direction
    (already flipped/shifted for reverse). Returns (L, Qp, Sp).

    With ``fmax`` (L, Qp) given, runs the scaled-linear kernel: frame_tm
    must then hold exp(frame - fmax) and the returned array needs
    _scaled_to_log."""
    L, Qp, Sp = frame_tm.shape
    kmax = plan['kmax']
    num_static = static_exp.shape[0]
    scaled = fmax is not None

    sched_lane = plan['sched_lane']
    sched_slot = plan['sched_slot']
    if reverse:
        # grid column t pairs carried beta at flipped position t-1 with the
        # original pair index L-1-t; original column alignment was step+1
        sched_lane = np.concatenate(
            [-np.ones((kmax, 1), np.int32), sched_lane[:, 1:][:, ::-1]], axis=1)
        sched_slot = np.concatenate(
            [np.zeros((kmax, 1), np.int32), sched_slot[:, 1:][:, ::-1]], axis=1)
        cls_onehot = np.concatenate(
            [cls_onehot[:1], cls_onehot[1:][::-1]], axis=0)

    g0, jl, js, G = _flat_schedule(sched_lane, sched_slot)
    # scratch slot count = DMA pipeline depth (scoped VMEM bound)
    num_slots = max(1, min(G, TILED_NUM_SLOTS))

    cls_plane = jnp.asarray(cls_onehot)
    if scaled:
        # the frame max shift rides a free channel of the class plane; the
        # reverse reorder of fmax mirrors the cls/frame row reorder above
        if reverse:
            fmax = jnp.concatenate([fmax[:1], fmax[1:][::-1]], axis=0)
        cls_plane = cls_plane.at[:, :, FMAX_CH].set(
            fmax.astype(jnp.float32))
        kernel = functools.partial(
            _fb_kernel_scaled, kmax=kmax, num_static=num_static,
            reverse=reverse, num_slots=num_slots, scale_col=Sp - 1, G=G)
        scratch_shapes = [
            pltpu.VMEM((Qp, Sp), jnp.float32),                 # carry u
            pltpu.VMEM((Qp, CLS_CHANNELS), jnp.float32),       # log scale
            pltpu.VMEM((num_slots, Sp, Sp), jnp.float32),      # breakend mats
            pltpu.SemaphoreType.DMA((num_slots,)),
        ]
    else:
        kernel = functools.partial(
            _fb_kernel_wrapped, kmax=kmax, num_static=num_static,
            reverse=reverse, num_slots=num_slots, G=G)
        scratch_shapes = [
            pltpu.VMEM((Qp, Sp), jnp.float32),                 # carry
            pltpu.VMEM((num_slots, Sp, Sp), jnp.float32),      # breakend mats
            pltpu.SemaphoreType.DMA((num_slots,)),
        ]

    # Both directions stream the SAME forward-time frame array: the
    # reverse recursion reads frame step L-t (what a host-side
    # ``concat([zeros, Ftp[::-1][:-1]])`` would hold at step t; the t=0
    # block is fetched but unread — the init step writes zeros) and
    # writes its output block at time L-1-t so betas come out in forward
    # time order. Folding the flip/shift into the index maps avoids
    # materializing reversed copies of the (L, Qp, Sp) frame and output
    # arrays in HBM.
    if reverse:
        frame_idx = lambda t, *_: (jnp.where(t == 0, 0, L - t), 0, 0)
        out_idx = lambda t, *_: (L - 1 - t, 0, 0)
    else:
        frame_idx = lambda t, *_: (t, 0, 0)
        out_idx = lambda t, *_: (t, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, Qp, Sp), frame_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, CLS_CHANNELS), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # static_exp resident
            pl.BlockSpec(memory_space=pl.ANY),    # be_exp stays in HBM
        ],
        out_specs=pl.BlockSpec((1, Qp, Sp), out_idx,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Qp, Sp), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(g0), jnp.asarray(jl), jnp.asarray(js),
      frame_tm, cls_plane, static_exp, be_exp)


def forward_backward_chains_pallas(framelogprob, static_bank, be_exp_pad,
                                   chain_seg_map, chain_last, plan,
                                   interpret=False):
    """Drop-in replacement for fb_scan.forward_backward_chains on TPU/f32.

    Args:
        framelogprob: (N, S) emission log probs
        static_bank: (num_static, S, S) static transition log-weights
        be_exp_pad: (J, Sp, Sp) breakend transition exp-weights for the
            current q(brk), zero-padded to the plan's lane width (the
            fused engine.breakend_tmats_exp output — building the bank in
            exp space skips a full (J, S, S) log materialization)
        chain_seg_map: (Q, L) global segment index, N for pads
        chain_last: (Q,) last real position per chain
        plan: build_pallas_plan output

    Returns:
        alphas (N, S), betas (N, S), log_norm (scalar)
    """
    N, S = framelogprob.shape
    Q, L = chain_seg_map.shape
    Sp, Qp = plan['Sp'], plan['Qp']

    pad_row = jnp.zeros((1, S), dtype=framelogprob.dtype)
    frame_ext = jnp.concatenate([framelogprob, pad_row], axis=0)
    F = frame_ext[chain_seg_map]                      # (Q, L, S)
    Ft = jnp.swapaxes(F, 0, 1)                        # (L, Q, S)
    Ftp = jnp.full((L, Qp, Sp), NEG, dtype=jnp.float32)
    Ftp = Ftp.at[:, Q:, :].set(0.0)
    Ftp = Ftp.at[:, :Q, :S].set(Ft.astype(jnp.float32))

    static_exp = jnp.zeros((static_bank.shape[0], Sp, Sp), dtype=jnp.float32)
    static_exp = static_exp.at[:, :S, :S].set(
        jnp.exp(static_bank).astype(jnp.float32))
    J = be_exp_pad.shape[0]
    if J:
        be_exp = be_exp_pad.astype(jnp.float32)
    else:
        be_exp = jnp.zeros((1, Sp, Sp), dtype=jnp.float32)

    if SCALED_LINEAR:
        # scaled-linear kernel: stream exp(frame - fmax); the shift is a
        # parallel-over-L XLA pass, off the serial critical path
        fmax = jnp.max(Ftp, axis=-1)                  # (L, Qp)
        frame_in = jnp.exp(Ftp - fmax[..., None])
    else:
        fmax = None
        frame_in = Ftp

    alphas_tm = _run_direction(
        frame_in, plan['cls_onehot'], static_exp, be_exp, plan, reverse=False,
        interpret=interpret, fmax=fmax)
    # the reverse runner reads the frame through a shifted-reversed index
    # map and writes betas in forward time order (no reversed HBM copies)
    betas_tm = _run_direction(
        frame_in, plan['cls_onehot'], static_exp, be_exp, plan, reverse=True,
        interpret=interpret, fmax=fmax)
    if SCALED_LINEAR:
        alphas_tm = _scaled_to_log(alphas_tm)
        betas_tm = _scaled_to_log(betas_tm)

    alphas_b = jnp.swapaxes(alphas_tm, 0, 1)[:Q, :, :S]   # (Q, L, S)
    betas_b = jnp.swapaxes(betas_tm, 0, 1)[:Q, :, :S]

    from remixt_tpu.ops.special import logsumexp
    alpha_last = jnp.take_along_axis(
        alphas_b, chain_last[:, None, None].astype(jnp.int32), axis=1)[:, 0, :]
    log_norm = jnp.sum(logsumexp(alpha_last, axis=-1))

    alphas = jnp.zeros((N + 1, S), dtype=framelogprob.dtype)
    alphas = alphas.at[chain_seg_map.reshape(-1)].set(
        alphas_b.reshape(-1, S).astype(framelogprob.dtype))[:N]
    betas = jnp.zeros((N + 1, S), dtype=framelogprob.dtype)
    betas = betas.at[chain_seg_map.reshape(-1)].set(
        betas_b.reshape(-1, S).astype(framelogprob.dtype))[:N]

    return alphas, betas, log_norm


def build_pallas_plan_restarts(chain_bank_idx_np, num_static_bank, Q, L, S,
                               num_restarts, num_breakends):
    """Kernel schedule for restart-tiled lanes.

    The restart axis folds into the lane axis: lane r*Q+q carries restart
    r's chain q. Class structure repeats per restart tile; breakend
    fix-ups multiply by R, each pointing at its restart's matrix (slot
    r*J + j).
    """
    R = num_restarts
    J = num_breakends
    Sp = _round_up(S, 128)
    if SCALED_LINEAR and Sp == S:
        Sp += 128   # pad column for the scaled kernel's log scale
    RQ = R * Q
    RQp = _round_up(max(RQ, 8), 8)
    nsteps = max(L - 1, 1)

    cls_idx = chain_bank_idx_np.T.copy()              # (L-1, Q)
    is_be = cls_idx >= num_static_bank
    be_slot = np.where(is_be, cls_idx - num_static_bank, 0)
    cls_idx = np.where(is_be, 0, cls_idx)
    if num_static_bank > CLS_CHANNELS - 1:
        # channel FMAX_CH is reserved for the scaled-linear frame shift
        raise ValueError('too many static transition classes for the kernel')

    cls_onehot = np.zeros((L, RQp, CLS_CHANNELS), dtype=np.float32)
    cls_onehot[:, :, 0] = 1.0                         # pads + column 0: cut
    for t in range(1, L):
        for q in range(Q):
            for r in range(R):
                cls_onehot[t, r * Q + q, :] = 0.0
                cls_onehot[t, r * Q + q, cls_idx[t - 1, q]] = 1.0

    steps, lanes = np.nonzero(is_be)
    kmax = max(int(np.bincount(steps, minlength=1).max()) * R
               if len(steps) else 1, 1)
    sched_lane = -np.ones((kmax, L), dtype=np.int32)
    sched_slot = np.zeros((kmax, L), dtype=np.int32)
    fill = np.zeros(L, dtype=np.int32)
    for t, q in zip(steps, lanes):
        col = t + 1
        for r in range(R):
            sched_lane[fill[col], col] = r * Q + q
            sched_slot[fill[col], col] = r * J + be_slot[t, q]
            fill[col] += 1

    return dict(Sp=Sp, Qp=RQp, kmax=kmax, cls_onehot=cls_onehot,
                sched_lane=sched_lane, sched_slot=sched_slot,
                num_restarts=R, Q=Q)


def forward_backward_chains_pallas_restarts(frame_b, static_bank, be_exp_b,
                                            chain_seg_map, chain_last, plan,
                                            interpret=False):
    """Restart-batched Pallas forward-backward: restarts tiled into lanes.

    Args:
        frame_b: (R, N, S) per-restart emission log probs
        static_bank: (num_static, S, S) shared log-weights
        be_exp_b: (R, J, Sp, Sp) per-restart breakend exp-weights,
            zero-padded to the plan's lane width
        plan: build_pallas_plan_restarts output

    Returns alphas (R, N, S), betas (R, N, S), log_norm (R,).
    """
    R, N, S = frame_b.shape
    Q, L = chain_seg_map.shape
    Sp, RQp = plan['Sp'], plan['Qp']
    J = be_exp_b.shape[1]

    pad_row = jnp.zeros((R, 1, S), dtype=frame_b.dtype)
    frame_ext = jnp.concatenate([frame_b, pad_row], axis=1)
    F = frame_ext[:, chain_seg_map.reshape(-1)].reshape(R, Q, L, S)
    Ft = jnp.transpose(F, (2, 0, 1, 3)).reshape(L, R * Q, S)
    Ftp = jnp.full((L, RQp, Sp), NEG, dtype=jnp.float32)
    Ftp = Ftp.at[:, R * Q:, :].set(0.0)
    Ftp = Ftp.at[:, :R * Q, :S].set(Ft.astype(jnp.float32))

    static_exp = jnp.zeros((static_bank.shape[0], Sp, Sp), dtype=jnp.float32)
    static_exp = static_exp.at[:, :S, :S].set(
        jnp.exp(static_bank).astype(jnp.float32))
    if J:
        be_exp = be_exp_b.astype(jnp.float32).reshape(R * J, Sp, Sp)
    else:
        be_exp = jnp.zeros((1, Sp, Sp), dtype=jnp.float32)

    if SCALED_LINEAR:
        fmax = jnp.max(Ftp, axis=-1)                  # (L, RQp)
        frame_in = jnp.exp(Ftp - fmax[..., None])
    else:
        fmax = None
        frame_in = Ftp

    alphas_tm = _run_direction(
        frame_in, plan['cls_onehot'], static_exp, be_exp, plan, reverse=False,
        interpret=interpret, fmax=fmax)
    # the reverse runner reads the frame through a shifted-reversed index
    # map and writes betas in forward time order (no reversed HBM copies)
    betas_tm = _run_direction(
        frame_in, plan['cls_onehot'], static_exp, be_exp, plan, reverse=True,
        interpret=interpret, fmax=fmax)
    if SCALED_LINEAR:
        alphas_tm = _scaled_to_log(alphas_tm)
        betas_tm = _scaled_to_log(betas_tm)

    alphas_b = jnp.swapaxes(alphas_tm, 0, 1)[:R * Q, :, :S].reshape(
        R, Q, L, S)
    betas_b = jnp.swapaxes(betas_tm, 0, 1)[:R * Q, :, :S].reshape(R, Q, L, S)

    from remixt_tpu.ops.special import logsumexp
    last = chain_last[None, :, None, None].astype(jnp.int32) * jnp.ones(
        (R, Q, 1, 1), jnp.int32)
    alpha_last = jnp.take_along_axis(alphas_b, last, axis=2)[:, :, 0, :]
    log_norm = jnp.sum(logsumexp(alpha_last, axis=-1), axis=-1)

    alphas = jnp.zeros((R, N + 1, S), dtype=frame_b.dtype)
    alphas = alphas.at[:, chain_seg_map.reshape(-1)].set(
        alphas_b.reshape(R, -1, S).astype(frame_b.dtype))[:, :N]
    betas = jnp.zeros((R, N + 1, S), dtype=frame_b.dtype)
    betas = betas.at[:, chain_seg_map.reshape(-1)].set(
        betas_b.reshape(R, -1, S).astype(frame_b.dtype))[:, :N]
    return alphas, betas, log_norm


def build_pallas_plan_restarts_grouped(chain_bank_idx_np, num_static_bank,
                                       Q, L, S, num_restarts, num_breakends):
    """Chain-major restart tiling: lane q*R + r carries restart r of chain q.

    A junction's R per-restart matrices are then a contiguous slab in a
    (J, R, S, S) bank — one DMA and one R-row lane-slab fix-up per
    junction, instead of R separate DMAs and full-plane masked writes.
    kmax stays the per-column junction count.

    Lanes pack densely (lane = q*R + r, no per-chain alignment padding —
    the fix-up addresses slabs with one-hot matmuls, not dynamic slices);
    only the tail pads to a sublane multiple.
    """
    R = num_restarts
    Sp = _round_up(S, 128)
    if SCALED_LINEAR and Sp == S:
        Sp += 128   # pad column for the scaled kernel's log scale
    RQp = _round_up(max(Q * R, 8), 8)

    cls_idx = chain_bank_idx_np.T.copy()              # (L-1, Q)
    is_be = cls_idx >= num_static_bank
    be_slot = np.where(is_be, cls_idx - num_static_bank, 0)
    cls_idx = np.where(is_be, 0, cls_idx)
    if num_static_bank > CLS_CHANNELS - 1:
        # channel FMAX_CH is reserved for the scaled-linear frame shift
        raise ValueError('too many static transition classes for the kernel')

    cls_onehot = np.zeros((L, RQp, CLS_CHANNELS), dtype=np.float32)
    cls_onehot[:, :, 0] = 1.0                         # tail pads: cut
    for t in range(1, L):
        for q in range(Q):
            rows = slice(q * R, q * R + R)
            cls_onehot[t, rows, :] = 0.0
            cls_onehot[t, rows, cls_idx[t - 1, q]] = 1.0

    steps, lanes = np.nonzero(is_be)
    kmax = max(int(np.bincount(steps, minlength=1).max())
               if len(steps) else 1, 1)
    sched_lane = -np.ones((kmax, L), dtype=np.int32)  # slab base lane (q*R)
    sched_slot = np.zeros((kmax, L), dtype=np.int32)  # junction index
    fill = np.zeros(L, dtype=np.int32)
    for t, q in zip(steps, lanes):
        col = t + 1
        sched_lane[fill[col], col] = q * R
        sched_slot[fill[col], col] = be_slot[t, q]
        fill[col] += 1

    return dict(Sp=Sp, Qp=RQp, kmax=kmax, cls_onehot=cls_onehot,
                sched_lane=sched_lane, sched_slot=sched_slot,
                num_restarts=R, Q=Q, grouped=True)


def _fb_kernel_grouped(g0_ref, jl_ref, js_ref,
                       frame_ref, cls_ref, static_exp_ref, be_exp_ref,
                       out_ref, carry_ref, be_scratch, sems,
                       *, kmax, num_static, reverse, num_slots, R,
                       fixup_vpu, G, static_slot=False):
    """Grouped restart-tiled kernel step: per junction, one fetch of the
    (R, Sp, Sp) matrix slab and one R-lane fix-up.

    The fix-up addresses the slab's lanes with one-hot selection matmuls
    and masked full-plane writes only — no dynamic sublane slicing, which
    Mosaic miscompiles/faults at production lane counts (Qp > 256).

    Each junction's (R, Sp, Sp) slab is fetched with ONE dynamic-slice
    DMA from the junction-major bank (rows [slot*R, (slot+1)*R)) into
    scratch slot g % num_slots in GLOBAL junction order
    (_flat_schedule): the fetch is issued when junction g - num_slots is
    applied, a rolling pipeline that crosses column boundaries. The
    fix-up runs either R serial 1-row MXU dots or one batched VPU
    multiply-reduce over the resident slab (``fixup_vpu``)."""
    t = pl.program_id(0)
    Qp = carry_ref.shape[0]

    def _fetch_slab(g, slot):
        pltpu.make_async_copy(
            be_exp_ref.at[pl.ds(js_ref[g] * R, R)],
            be_scratch.at[slot],
            sems.at[slot]).start()

    @pl.when(t == 0)
    def _init():
        if reverse:
            carry_ref[:, :] = jnp.zeros_like(carry_ref)
            out_ref[0, :, :] = jnp.zeros_like(carry_ref)
        else:
            carry_ref[:, :] = frame_ref[0, :, :]
            out_ref[0, :, :] = frame_ref[0, :, :]
        for k in range(min(num_slots, G)):
            _fetch_slab(k, k)

    @pl.when(t > 0)
    def _step():
        if reverse:
            carry = carry_ref[:, :] + frame_ref[0, :, :]
        else:
            carry = carry_ref[:, :]

        cmax = jnp.max(carry, axis=-1, keepdims=True)
        u = jnp.exp(carry - cmax)

        # linear-space class selection, single log plane (see the
        # non-grouped kernel: bit-identical, saves num_static-1 log planes)
        s_sel = jnp.broadcast_to(
            jnp.sum(u, axis=-1, keepdims=True), u.shape)   # cut class

        for c in range(1, num_static):
            mat = static_exp_ref[c, :, :]
            if reverse:
                s = jnp.dot(u, mat.T, preferred_element_type=jnp.float32,
                            precision=MM_PRECISION_PALLAS)
            else:
                s = jnp.dot(u, mat, preferred_element_type=jnp.float32,
                            precision=MM_PRECISION_PALLAS)
            lane_is_c = cls_ref[0, :, c:c + 1] > 0.5
            s_sel = jnp.where(lane_is_c, s, s_sel)

        result = jnp.log(jnp.maximum(s_sel, TINY)) + cmax

        if reverse:
            out_ref[0, :, :] = result
            carry_ref[:, :] = result
        else:
            out_val = result + frame_ref[0, :, :]
            out_ref[0, :, :] = out_val
            carry_ref[:, :] = out_val

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (Qp, 1), 0)

        g_lo = g0_ref[t]
        g_hi = g0_ref[t + 1]

        def _apply_with_slot(g, slot_static):
            """Fix-up for junction g with its scratch slot as a PYTHON int.

            Factored so the static-slot variant can unroll over slots:
            every ``be_scratch`` access then has a static leading index —
            the dynamic-leading-index 3D slab read is the one op unique
            to the (VPU fix-up, slots>1) combination that reproducibly
            faults the device at R=10/R=4 (docs/DESIGN.md)."""
            lane = jl_ref[g]
            pltpu.make_async_copy(
                be_exp_ref.at[pl.ds(js_ref[g] * R, R)],
                be_scratch.at[slot_static],
                sems.at[slot_static]).wait()
            # gather the slab's R lanes of (pre-update) u and cmax with
            # a one-hot (R, Qp) selection matmul: exact, since each
            # output row has exactly one unit coefficient
            slab_iota = jax.lax.broadcasted_iota(jnp.int32, (R, Qp), 0)
            col_iota = jax.lax.broadcasted_iota(jnp.int32, (R, Qp), 1)
            sel = (col_iota == lane + slab_iota).astype(jnp.float32)
            # the selection/scatter dots implement lane ADDRESSING
            # (one unit coefficient per output row) — they must stay
            # exact regardless of the semiring MM_PRECISION ablation,
            # so pin them to HIGHEST
            u_slab = jnp.dot(sel, u, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            cmax_slab = jnp.dot(sel, cmax,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            if fixup_vpu:
                # batched matvec as a VPU multiply-reduce over the
                # resident slab: one op instead of R serial 1-row MXU
                # dots (each of which pays full pipeline latency)
                slab = be_scratch[slot_static, :, :, :]     # (R, Sp, Sp)
                if reverse:
                    s = jnp.sum(u_slab[:, None, :] * slab, axis=2)
                else:
                    s = jnp.sum(u_slab[:, :, None] * slab, axis=1)
            else:
                rows = []
                for r in range(R):
                    mat = be_scratch[slot_static, r, :, :]
                    if reverse:
                        s_r = jnp.dot(u_slab[r:r + 1, :], mat.T,
                                      preferred_element_type=jnp.float32,
                                      precision=MM_PRECISION_PALLAS)
                    else:
                        s_r = jnp.dot(u_slab[r:r + 1, :], mat,
                                      preferred_element_type=jnp.float32,
                                      precision=MM_PRECISION_PALLAS)
                    rows.append(s_r)
                s = jnp.concatenate(rows, axis=0)
            val = jnp.log(jnp.maximum(s, TINY)) + cmax_slab
            # scatter back to the full plane (selᵀ) and overwrite the
            # slab's R lanes; other lanes keep their value
            full = jnp.dot(sel.T, val,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            if not reverse:
                full = full + frame_ref[0, :, :]
            mask = (row_iota >= lane) & (row_iota < lane + R)
            out_ref[0, :, :] = jnp.where(mask, full, out_ref[0, :, :])
            carry_ref[:, :] = jnp.where(mask, full, carry_ref[:, :])

            # the slot just read is free: refill with the junction
            # num_slots ahead (same slot by construction)
            @pl.when(g + num_slots < G)
            def _refill():
                _fetch_slab(g + num_slots, slot_static)

        for k in range(kmax):
            if static_slot:
                # unroll the fix-up over scratch slots so every VMEM slab
                # access has a static leading index (num_slots copies of
                # the body; num_slots is 2 by default)
                for s_static in range(num_slots):
                    @pl.when((g_lo + k < g_hi)
                             & (jax.lax.rem(g_lo + k, np.int32(num_slots))
                                == s_static))
                    def _apply(k=k, s_static=s_static):
                        _apply_with_slot(g_lo + k, s_static)
            else:
                @pl.when(g_lo + k < g_hi)
                def _apply(k=k):
                    g = g_lo + k
                    _apply_with_slot(g, jax.lax.rem(g, np.int32(num_slots)))


def _fb_kernel_grouped_scaled(g0_ref, jl_ref, js_ref,
                              frame_ref, cls_ref, static_exp_ref, be_exp_ref,
                              out_ref, carry_ref, scale_ref, be_scratch, sems,
                              *, kmax, num_static, reverse, num_slots, R,
                              fixup_vpu, scale_col, G):
    """Scaled-linear-space variant of _fb_kernel_grouped: same junction
    slab pipeline / one-hot addressing, but the carry stays in per-lane
    max-normalized linear space with a log-scale scratch (see
    _fb_kernel_scaled for the numerics contract)."""
    t = pl.program_id(0)
    Qp = carry_ref.shape[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, carry_ref.shape, 1)

    def _fetch_slab(g, slot):
        pltpu.make_async_copy(
            be_exp_ref.at[pl.ds(js_ref[g] * R, R)],
            be_scratch.at[slot],
            sems.at[slot]).start()

    @pl.when(t == 0)
    def _init():
        if reverse:
            u0 = jnp.ones_like(carry_ref)
            sc0 = jnp.zeros_like(scale_ref)
        else:
            u0 = frame_ref[0, :, :]
            sc0 = jnp.broadcast_to(
                cls_ref[0, :, FMAX_CH:FMAX_CH + 1], scale_ref.shape)
        carry_ref[:, :] = u0
        scale_ref[:, :] = sc0
        out_ref[0, :, :] = jnp.where(col_iota == scale_col, sc0[:, :1], u0)
        for k in range(min(num_slots, G)):
            _fetch_slab(k, k)

    @pl.when(t > 0)
    def _step():
        u_prev = carry_ref[:, :]
        sc_prev = scale_ref[:, :]
        fmax_t = cls_ref[0, :, FMAX_CH:FMAX_CH + 1]      # (Qp, 1)
        frame_exp = frame_ref[0, :, :]

        base = u_prev * frame_exp if reverse else u_prev

        s_sel = jnp.broadcast_to(
            jnp.sum(base, axis=-1, keepdims=True), base.shape)   # cut class
        for c in range(1, num_static):
            mat = static_exp_ref[c, :, :]
            if reverse:
                s = jnp.dot(base, mat.T, preferred_element_type=jnp.float32,
                            precision=MM_PRECISION_PALLAS)
            else:
                s = jnp.dot(base, mat, preferred_element_type=jnp.float32,
                            precision=MM_PRECISION_PALLAS)
            lane_is_c = cls_ref[0, :, c:c + 1] > 0.5
            s_sel = jnp.where(lane_is_c, s, s_sel)

        if not reverse:
            s_sel = s_sel * frame_exp

        m = jnp.maximum(jnp.max(s_sel, axis=-1, keepdims=True), TINY)
        u = s_sel * (1.0 / m)
        scale = sc_prev + jnp.log(m) + fmax_t

        out_ref[0, :, :] = jnp.where(col_iota == scale_col, scale[:, :1], u)
        carry_ref[:, :] = u
        scale_ref[:, :] = scale

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (Qp, 1), 0)

        g_lo = g0_ref[t]
        g_hi = g0_ref[t + 1]
        for k in range(kmax):

            @pl.when(g_lo + k < g_hi)
            def _apply(k=k):
                g = g_lo + k
                slot = jax.lax.rem(g, np.int32(num_slots))
                lane = jl_ref[g]
                pltpu.make_async_copy(
                    be_exp_ref.at[pl.ds(js_ref[g] * R, R)],
                    be_scratch.at[slot],
                    sems.at[slot]).wait()
                # gather the slab's R lanes of the PRE-update base with a
                # one-hot (R, Qp) selection matmul (exact: one unit
                # coefficient per output row; lane ADDRESSING stays at
                # HIGHEST regardless of the semiring precision knob)
                slab_iota = jax.lax.broadcasted_iota(jnp.int32, (R, Qp), 0)
                col_sel = jax.lax.broadcasted_iota(jnp.int32, (R, Qp), 1)
                sel = (col_sel == lane + slab_iota).astype(jnp.float32)
                base_slab = jnp.dot(sel, base,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
                if fixup_vpu:
                    slab = be_scratch[slot, :, :, :]            # (R, Sp, Sp)
                    if reverse:
                        s_slab = jnp.sum(base_slab[:, None, :] * slab, axis=2)
                    else:
                        s_slab = jnp.sum(base_slab[:, :, None] * slab, axis=1)
                else:
                    rows = []
                    for r in range(R):
                        mat = be_scratch[slot, r, :, :]
                        if reverse:
                            s_r = jnp.dot(base_slab[r:r + 1, :], mat.T,
                                          preferred_element_type=jnp.float32,
                                          precision=MM_PRECISION_PALLAS)
                        else:
                            s_r = jnp.dot(base_slab[r:r + 1, :], mat,
                                          preferred_element_type=jnp.float32,
                                          precision=MM_PRECISION_PALLAS)
                        rows.append(s_r)
                    s_slab = jnp.concatenate(rows, axis=0)
                if not reverse:
                    frame_slab = jnp.dot(sel, frame_exp,
                                         preferred_element_type=jnp.float32,
                                         precision=jax.lax.Precision.HIGHEST)
                    s_slab = s_slab * frame_slab
                m_slab = jnp.maximum(
                    jnp.max(s_slab, axis=-1, keepdims=True), TINY)  # (R, 1)
                u_slab = s_slab * (1.0 / m_slab)
                sc_prev_slab = jnp.dot(sel, sc_prev[:, :1],
                                       preferred_element_type=jnp.float32,
                                       precision=jax.lax.Precision.HIGHEST)
                fmax_slab = jnp.dot(sel, fmax_t,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
                scale_slab = sc_prev_slab + jnp.log(m_slab) + fmax_slab
                # scatter back to the full plane (selᵀ) and overwrite the
                # slab's R lanes; other lanes keep their value
                full_u = jnp.dot(sel.T, u_slab,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                full_scale = jnp.dot(sel.T, scale_slab,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
                mask = (row_iota >= lane) & (row_iota < lane + R)
                patched = jnp.where(col_iota == scale_col, full_scale, full_u)
                out_ref[0, :, :] = jnp.where(mask, patched, out_ref[0, :, :])
                carry_ref[:, :] = jnp.where(mask, full_u, carry_ref[:, :])
                scale_ref[:, :] = jnp.where(
                    mask, jnp.broadcast_to(full_scale, scale_ref.shape),
                    scale_ref[:, :])

                @pl.when(g + num_slots < G)
                def _refill():
                    _fetch_slab(g + num_slots, slot)


def _run_direction_grouped(frame_tm, cls_onehot, static_exp, be_exp_grouped,
                           plan, reverse, interpret=False, fmax=None):
    """Grouped-kernel direction runner; be_exp_grouped is (J*R, Sp, Sp),
    junction-major (junction j's restart slab at rows [j*R, (j+1)*R))."""
    L, Qp, Sp = frame_tm.shape
    kmax = plan['kmax']
    R = plan['num_restarts']
    num_static = static_exp.shape[0]
    scaled = fmax is not None

    sched_lane = plan['sched_lane']
    sched_slot = plan['sched_slot']
    if reverse:
        sched_lane = np.concatenate(
            [-np.ones((kmax, 1), np.int32), sched_lane[:, 1:][:, ::-1]], axis=1)
        sched_slot = np.concatenate(
            [np.zeros((kmax, 1), np.int32), sched_slot[:, 1:][:, ::-1]], axis=1)
        cls_onehot = np.concatenate(
            [cls_onehot[:1], cls_onehot[1:][::-1]], axis=0)

    g0, jl, js, G = _flat_schedule(sched_lane, sched_slot)
    # slab pipeline depth (each slot is an (R, Sp, Sp) slab of VMEM)
    num_slots = max(1, min(G, GROUPED_NUM_SLOTS))

    cls_plane = jnp.asarray(cls_onehot)
    if scaled:
        if reverse:
            fmax = jnp.concatenate([fmax[:1], fmax[1:][::-1]], axis=0)
        cls_plane = cls_plane.at[:, :, FMAX_CH].set(fmax.astype(jnp.float32))
        kernel = functools.partial(
            _fb_kernel_grouped_scaled, kmax=kmax, num_static=num_static,
            reverse=reverse, num_slots=num_slots, R=R,
            fixup_vpu=GROUPED_FIXUP_VPU, scale_col=Sp - 1, G=G)
    else:
        kernel = functools.partial(
            _fb_kernel_grouped, kmax=kmax, num_static=num_static,
            reverse=reverse, num_slots=num_slots, R=R,
            fixup_vpu=GROUPED_FIXUP_VPU, G=G,
            static_slot=GROUPED_STATIC_SLOT)

    # Both directions stream the SAME forward-time frame array; the
    # reverse recursion reads frame step L-t (the shifted reversed
    # sequence, i.e. what a host-side
    # ``concat([zeros, Ftp[::-1][:-1]])`` would hold at step t — the
    # t=0 block is fetched but unread: the kernel's init step writes
    # zeros) and writes its output block at time L-1-t, so betas come
    # out in forward time order. Folding both into index maps avoids
    # materializing a reversed copy of the 100+ MB frame and output
    # arrays in HBM.
    if reverse:
        frame_idx = lambda t, *_: (jnp.where(t == 0, 0, L - t), 0, 0)
        out_idx = lambda t, *_: (L - 1 - t, 0, 0)
    else:
        frame_idx = lambda t, *_: (t, 0, 0)
        out_idx = lambda t, *_: (t, 0, 0)

    scratch_shapes = [
        pltpu.VMEM((Qp, Sp), jnp.float32),                 # carry
    ]
    if scaled:
        scratch_shapes.append(
            pltpu.VMEM((Qp, CLS_CHANNELS), jnp.float32))   # log scale
    scratch_shapes += [
        pltpu.VMEM((num_slots, R, Sp, Sp), jnp.float32),   # junction slabs
        pltpu.SemaphoreType.DMA((num_slots,)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, Qp, Sp), frame_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qp, CLS_CHANNELS), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Qp, Sp), out_idx,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )

    # the junction slabs alone are num_slots*R*Sp^2 floats (~14 MB at
    # R=12, Sp=384) — beyond the 16 MB default scoped-VMEM budget, so ask
    # Mosaic for a larger window (v5e has 128 MB VMEM per core)
    vmem_bytes = 4 * (num_slots * R * Sp * Sp + 2 * Qp * Sp) \
        + 4 * 2 * Qp * (Sp + CLS_CHANNELS) + 4 * num_static * Sp * Sp \
        + 8 * 1024 * 1024
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Qp, Sp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 110 * 1024 * 1024)),
        interpret=interpret,
    )(jnp.asarray(g0), jnp.asarray(jl), jnp.asarray(js),
      frame_tm, cls_plane, static_exp, be_exp_grouped)


def forward_backward_chains_pallas_grouped(frame_b, static_bank, be_exp_b,
                                           chain_seg_map, chain_last, plan,
                                           interpret=False):
    """Grouped restart-tiled Pallas forward-backward (chain-major lanes).

    Same contract as forward_backward_chains_pallas_restarts: the
    breakend bank arrives restart-major (R, J, Sp, Sp), already padded
    (engine._restart_exp_bank); the one explicit transpose below puts it
    in the kernel's junction-major slab layout. (Producing it
    junction-major at the source measured 21% slower end to end — the
    batched einsums against the transposed layout cost more than this
    single pass.)
    """
    R, N, S = frame_b.shape
    Q, L = chain_seg_map.shape
    Sp, RQp = plan['Sp'], plan['Qp']
    J = be_exp_b.shape[1]

    pad_row = jnp.zeros((R, 1, S), dtype=frame_b.dtype)
    frame_ext = jnp.concatenate([frame_b, pad_row], axis=1)
    F = frame_ext[:, chain_seg_map.reshape(-1)].reshape(R, Q, L, S)
    # chain-major lanes: lane q*R + r, densely packed; tail pads carry
    # zero frames
    Ft = jnp.transpose(F, (2, 1, 0, 3))               # (L, Q, R, S)
    Ftp = jnp.full((L, RQp, Sp), NEG, dtype=jnp.float32)
    Ftp = Ftp.at[:, Q * R:, :].set(0.0)
    Ftp = Ftp.at[:, :Q * R, :S].set(
        Ft.reshape(L, Q * R, S).astype(jnp.float32))

    static_exp = jnp.zeros((static_bank.shape[0], Sp, Sp), dtype=jnp.float32)
    static_exp = static_exp.at[:, :S, :S].set(
        jnp.exp(static_bank).astype(jnp.float32))
    # 3D junction-major bank (J*R, Sp, Sp), slab of junction j at rows
    # [j*R, (j+1)*R): a 4D (J, R, Sp, Sp) ANY-space ref faults on
    # hardware at production scale (large streamed arrays + multi-GB
    # bank), while this flat layout is the restart-tiled kernel's proven
    # addressing pattern.
    if J:
        be_exp = jnp.swapaxes(be_exp_b.astype(jnp.float32), 0, 1).reshape(
            J * R, Sp, Sp)
    else:
        be_exp = jnp.zeros((R, Sp, Sp), dtype=jnp.float32)

    if SCALED_LINEAR:
        fmax = jnp.max(Ftp, axis=-1)                  # (L, RQp)
        frame_in = jnp.exp(Ftp - fmax[..., None])
    else:
        fmax = None
        frame_in = Ftp

    alphas_tm = _run_direction_grouped(
        frame_in, plan['cls_onehot'], static_exp, be_exp, plan, reverse=False,
        interpret=interpret, fmax=fmax)
    # the reverse runner reads the frame through a shifted-reversed index
    # map and writes betas in forward time order (no reversed HBM copies)
    betas_tm = _run_direction_grouped(
        frame_in, plan['cls_onehot'], static_exp, be_exp, plan, reverse=True,
        interpret=interpret, fmax=fmax)
    if SCALED_LINEAR:
        alphas_tm = _scaled_to_log(alphas_tm)
        betas_tm = _scaled_to_log(betas_tm)

    # lanes (q, r) -> (R, Q, L, S), dropping tail pads
    alphas_b = jnp.transpose(
        jnp.swapaxes(alphas_tm, 0, 1)[:Q * R, :, :S].reshape(
            Q, R, L, S), (1, 0, 2, 3))
    betas_b = jnp.transpose(
        jnp.swapaxes(betas_tm, 0, 1)[:Q * R, :, :S].reshape(
            Q, R, L, S), (1, 0, 2, 3))

    from remixt_tpu.ops.special import logsumexp
    last = chain_last[None, :, None, None].astype(jnp.int32) * jnp.ones(
        (R, Q, 1, 1), jnp.int32)
    alpha_last = jnp.take_along_axis(alphas_b, last, axis=2)[:, :, 0, :]
    log_norm = jnp.sum(logsumexp(alpha_last, axis=-1), axis=-1)

    alphas = jnp.zeros((R, N + 1, S), dtype=frame_b.dtype)
    alphas = alphas.at[:, chain_seg_map.reshape(-1)].set(
        alphas_b.reshape(R, -1, S).astype(frame_b.dtype))[:, :N]
    betas = jnp.zeros((R, N + 1, S), dtype=frame_b.dtype)
    betas = betas.at[:, chain_seg_map.reshape(-1)].set(
        betas_b.reshape(R, -1, S).astype(frame_b.dtype))[:, :N]
    return alphas, betas, log_norm
