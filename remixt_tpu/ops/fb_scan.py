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
