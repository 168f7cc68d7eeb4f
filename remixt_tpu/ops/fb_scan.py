"""Chain message passing over per-pair transition banks.

The genome segment chain (N segments, S copy-number states) uses a different
transition matrix per adjacent pair, but the matrices take only a few distinct
values: one shared matrix per (segment-class, segment-class) pair for plain
adjacencies, the zero matrix for telomere boundaries, and one matrix per
breakend (dependent on the variational breakpoint distribution). The scan
carries an S-vector and gathers the pair's matrix from a stacked bank —
O(N·S) live memory instead of the reference's O(N·S²) materialization
(/root/reference/remixt/bpmodel.pyx:558, the 32 GB memory wall).

Reference recursions: sum_product (bpmodel.pyx:1213-1246), max_product
(bpmodel.pyx:1295-1333).
"""

import jax
import jax.numpy as jnp

from remixt_tpu.ops.special import logsumexp


def forward_backward(framelogprob, bank, bank_idx):
    """Log-space forward-backward.

    Args:
        framelogprob: (N, S) emission log probabilities
        bank: (num_bank, S, S) stacked transition log-weight matrices
        bank_idx: (N-1,) int index of the matrix for each adjacent pair

    Returns:
        alphas (N, S), betas (N, S), log_norm_const (scalar)
    """
    f0 = framelogprob[0]
    fs = framelogprob[1:]

    def fwd_step(alpha, inputs):
        idx, f_next = inputs
        tmat = jax.lax.dynamic_index_in_dim(bank, idx, keepdims=False)
        alpha_next = logsumexp(alpha[:, None] + tmat, axis=0) + f_next
        return alpha_next, alpha_next

    _, alphas_rest = jax.lax.scan(fwd_step, f0, (bank_idx, fs))
    alphas = jnp.concatenate([f0[None], alphas_rest], axis=0)

    def bwd_step(beta, inputs):
        idx, f_next = inputs
        tmat = jax.lax.dynamic_index_in_dim(bank, idx, keepdims=False)
        beta_prev = logsumexp(tmat + (f_next + beta)[None, :], axis=1)
        return beta_prev, beta_prev

    beta_last = jnp.zeros_like(f0)
    _, betas_rest = jax.lax.scan(
        bwd_step, beta_last, (bank_idx, fs), reverse=True)
    betas = jnp.concatenate([betas_rest, beta_last[None]], axis=0)

    log_norm = logsumexp(alphas[-1], axis=-1)
    return alphas, betas, log_norm


def forward_backward_chains(framelogprob, bank, chain_bank_idx, chain_seg_map,
                            chain_last, chain_constraint=None):
    """Chain-batched log-space forward-backward.

    The genome chain factorizes exactly at free (telomere) junctions
    (bpmodel.pyx:648-650: zero transition matrices), so chromosomes/chains
    are independent sub-chains. Batching them — scan over the longest chain,
    vmap over chains — cuts the serial dependency from N steps to
    max-chain-length steps and makes the chain axis shardable across devices
    with no communication inside the scan.

    Per-chain alphas/betas differ from the single-long-chain formulation only
    by per-chain scalar shifts (the cumulative log-norm carry across free
    junctions), which cancel in every normalized consumer; the total log
    normalizer is the sum of per-chain log norms.

    Args:
        framelogprob: (N, S) global emission log probs
        bank: (num_bank, S, S); bank[0] MUST be the zero (cut) matrix
        chain_bank_idx: (Q, L-1) bank index per within-chain pair (0 on pads)
        chain_seg_map: (Q, L) global segment index, N for pads
        chain_last: (Q,) index of each chain's last real position
        chain_constraint: optional callable (array, q_axis) -> array applying
            a device-mesh sharding constraint on the chain (Q) axis — the
            sequence-parallel analogue. The scan has no cross-chain
            communication, so sharding Q is communication-free.

    Returns:
        alphas (N, S), betas (N, S), log_norm (scalar)
    """
    S = framelogprob.shape[-1]
    Q, L = chain_seg_map.shape

    pad_row = jnp.zeros((1, S), dtype=framelogprob.dtype)
    frame_ext = jnp.concatenate([framelogprob, pad_row], axis=0)
    F = frame_ext[chain_seg_map]                      # (Q, L, S)

    Ft = jnp.swapaxes(F, 0, 1)                        # (L, Q, S)
    Bt = jnp.swapaxes(chain_bank_idx, 0, 1)           # (L-1, Q)

    if chain_constraint is not None:
        Ft = chain_constraint(Ft, 1)
        Bt = chain_constraint(Bt, 1)

    # Real-space semiring: transition log-weights are <= 0, so exp(bank) is
    # in [0, 1] and the per-step log-matvec becomes an MXU matmul after a
    # per-lane max shift. Paths below the dtype underflow threshold relative
    # to the lane maximum clip to zero exactly as in max-shifted logsumexp;
    # a state whose every incoming path clips goes to -inf and recovers next
    # step (its posterior mass is below precision either way). exp(bank) is
    # loop-invariant and hoisted out of the scan by XLA.
    exp_bank = jnp.exp(bank)

    def fwd_step(alpha, inputs):
        bidx, f_next = inputs                         # (Q,), (Q, S)
        P = exp_bank[bidx]                            # (Q, S, S)
        amax = jnp.max(alpha, axis=-1, keepdims=True)
        u = jnp.exp(alpha - amax)
        s = jnp.einsum('qi,qij->qj', u, P,
                       preferred_element_type=alpha.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        alpha_next = jnp.log(s) + amax + f_next
        if chain_constraint is not None:
            alpha_next = chain_constraint(alpha_next, 0)
        return alpha_next, alpha_next

    alpha0 = Ft[0]
    _, alphas_rest = jax.lax.scan(fwd_step, alpha0, (Bt, Ft[1:]))
    alphas_b = jnp.concatenate([alpha0[None], alphas_rest], axis=0)   # (L, Q, S)

    def bwd_step(beta, inputs):
        bidx, f_next = inputs
        P = exp_bank[bidx]
        fb = f_next + beta
        bmax = jnp.max(fb, axis=-1, keepdims=True)
        w = jnp.exp(fb - bmax)
        s = jnp.einsum('qij,qj->qi', P, w,
                       preferred_element_type=beta.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        beta_prev = jnp.log(s) + bmax
        if chain_constraint is not None:
            beta_prev = chain_constraint(beta_prev, 0)
        return beta_prev, beta_prev

    beta_last = jnp.zeros_like(alpha0)
    _, betas_rest = jax.lax.scan(bwd_step, beta_last, (Bt, Ft[1:]), reverse=True)
    betas_b = jnp.concatenate([betas_rest, beta_last[None]], axis=0)  # (L, Q, S)

    alphas_b = jnp.swapaxes(alphas_b, 0, 1)           # (Q, L, S)
    betas_b = jnp.swapaxes(betas_b, 0, 1)

    # per-chain log norm at each chain's true last position
    alpha_last = jnp.take_along_axis(
        alphas_b, chain_last[:, None, None].astype(jnp.int32), axis=1)[:, 0, :]
    log_norm = jnp.sum(logsumexp(alpha_last, axis=-1))

    # scatter back to the global segment layout (pads write to row N, dropped)
    N = framelogprob.shape[0]
    alphas = jnp.zeros((N + 1, S), dtype=framelogprob.dtype)
    alphas = alphas.at[chain_seg_map.reshape(-1)].set(
        alphas_b.reshape(-1, S))[:N]
    betas = jnp.zeros((N + 1, S), dtype=framelogprob.dtype)
    betas = betas.at[chain_seg_map.reshape(-1)].set(
        betas_b.reshape(-1, S))[:N]

    return alphas, betas, log_norm


def viterbi_chains(framelogprob, bank, chain_bank_idx, chain_seg_map, chain_last):
    """Chain-batched max-product decoding; same batching as
    forward_backward_chains. Returns (state_sequence (N,), logprob)."""
    S = framelogprob.shape[-1]
    Q, L = chain_seg_map.shape
    N = framelogprob.shape[0]

    pad_row = jnp.zeros((1, S), dtype=framelogprob.dtype)
    frame_ext = jnp.concatenate([framelogprob, pad_row], axis=0)
    F = frame_ext[chain_seg_map]
    Ft = jnp.swapaxes(F, 0, 1)
    Bt = jnp.swapaxes(chain_bank_idx, 0, 1)

    def fwd_step(score, inputs):
        bidx, f_next = inputs
        tmat = bank[bidx]
        cand = score[:, :, None] + tmat
        best = jnp.max(cand, axis=1)
        ptr = jnp.argmax(cand, axis=1).astype(jnp.int32)
        return best + f_next, (best + f_next, ptr)

    score0 = Ft[0]
    _, (scores_rest, ptrs) = jax.lax.scan(fwd_step, score0, (Bt, Ft[1:]))
    scores = jnp.concatenate([score0[None], scores_rest], axis=0)  # (L, Q, S)
    scores_b = jnp.swapaxes(scores, 0, 1)                          # (Q, L, S)

    # start traceback at each chain's true last position. For pads past the
    # end the pointer rows select argmax of a constant matrix (zeros), so a
    # reverse scan from L-1 would corrupt the carry; instead gather the state
    # at last and walk back with positional masking.
    last_state = jnp.argmax(jnp.take_along_axis(
        scores_b, chain_last[:, None, None].astype(jnp.int32), axis=1)[:, 0, :],
        axis=-1).astype(jnp.int32)
    logprob = jnp.sum(jnp.max(jnp.take_along_axis(
        scores_b, chain_last[:, None, None].astype(jnp.int32), axis=1)[:, 0, :],
        axis=-1))

    ptrs_b = jnp.swapaxes(ptrs, 0, 1)                              # (Q, L-1, S)

    def back_step(state, inputs):
        t, ptr_row = inputs                                        # (Q, S)
        prev = jnp.take_along_axis(ptr_row, state[:, None], axis=1)[:, 0]
        # only step back where t < chain_last (pair feeds a real position)
        state_prev = jnp.where(t < chain_last, prev, state)
        return state_prev, state_prev

    ts = jnp.arange(L - 1, dtype=jnp.int32)
    _, seq_rest = jax.lax.scan(
        back_step, last_state, (ts, jnp.swapaxes(ptrs_b, 0, 1)), reverse=True)
    # seq_rest[t] = state at position t for each chain (t in 0..L-2)
    seq_b = jnp.concatenate([jnp.swapaxes(seq_rest, 0, 1),
                             last_state[:, None]], axis=1)          # (Q, L)
    # positions beyond chain_last hold the (stationary) last state; for the
    # true last position take last_state explicitly
    seq_b = jnp.where(jnp.arange(L)[None, :] >= chain_last[:, None],
                      last_state[:, None], seq_b)

    seq = jnp.zeros((N + 1,), dtype=jnp.int32)
    seq = seq.at[chain_seg_map.reshape(-1)].set(seq_b.reshape(-1))[:N]
    return seq, logprob


def viterbi(framelogprob, bank, bank_idx):
    """Max-product decoding with first-maximum tie-breaking.

    Returns:
        state_sequence (N,) int32, logprob (scalar)
    """
    f0 = framelogprob[0]
    fs = framelogprob[1:]

    def fwd_step(score, inputs):
        idx, f_next = inputs
        tmat = jax.lax.dynamic_index_in_dim(bank, idx, keepdims=False)
        cand = score[:, None] + tmat
        best = jnp.max(cand, axis=0)
        ptr = jnp.argmax(cand, axis=0).astype(jnp.int32)
        return best + f_next, (best + f_next, ptr)

    _, (scores_rest, ptrs) = jax.lax.scan(fwd_step, f0, (bank_idx, fs))
    final_score = jnp.concatenate([f0[None], scores_rest], axis=0)[-1]

    last_state = jnp.argmax(final_score).astype(jnp.int32)
    logprob = final_score[last_state]

    def back_step(state, ptr_row):
        prev = ptr_row[state]
        return prev, prev

    _, seq_rest = jax.lax.scan(back_step, last_state, ptrs, reverse=True)
    state_sequence = jnp.concatenate([seq_rest, last_state[None]], axis=0)
    return state_sequence, logprob
