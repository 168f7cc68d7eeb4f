"""Shared test fixtures: small random model problems with known structure.

Follows the reference test strategy (SURVEY.md §4): brute-force enumeration
oracles on tiny chains, randomized data, seeded generators.
"""

import numpy as np

from remixt_tpu.models import states as states_mod
from remixt_tpu.models.oracle import OracleModel


def make_problem(seed=0, N=6, M=2, cn_max=2, num_breakpoints=1,
                 normal_contamination=True, h=None,
                 transition_penalty=2.0, divergence_weight=1e-7,
                 mean_depth=100.0, num_telomeres=0):
    """Build a small random model problem and matching OracleModel kwargs.

    Breakpoints are placed at random interior non-adjacent pair positions,
    two breakends each, with random orientations.
    """
    rng = np.random.RandomState(seed)

    cn_states_one = states_mod.enumerate_cn_states(M, 2, cn_max, 1)
    if not normal_contamination:
        cn_states_one = cn_states_one.copy()
        cn_states_one[:, 0, :] = 0
    S = cn_states_one.shape[0]
    cn_states = np.tile(cn_states_one[None], (N, 1, 1, 1))
    brk_states = states_mod.enumerate_brk_states(M, cn_max, 1)

    if h is None:
        h = np.array([0.2] + [0.6 / (M - 1)] * (M - 1))[:M]
    h = np.asarray(h, dtype=float)

    # simulate data from a random true state path
    true_states = rng.randint(S, size=N)
    true_cn = cn_states[np.arange(N), true_states]
    l = rng.uniform(0.5e6, 2e6, size=N)
    depth_scale = mean_depth / max(np.einsum('nml,m->', true_cn, h) / (2.0 * N), 1e-9)
    mu = l * np.einsum('nml,m->n', true_cn, h) / 1e6 * depth_scale
    x_total = rng.poisson(np.maximum(mu, 1e-3)).astype(float)
    minor_depth = np.einsum('nm,m->n', true_cn[:, :, 0], h)
    total_depth = np.einsum('nml,m->n', true_cn, h)
    ratio = np.where(total_depth > 0, minor_depth / np.maximum(total_depth, 1e-9), 0.5)
    ratio = np.clip(ratio, 0.05, 0.95)
    y_total = rng.binomial(np.maximum(x_total.astype(int), 1), 0.8).astype(float)
    y_minor = rng.binomial(y_total.astype(int), ratio).astype(float)
    y = np.stack([y_minor, y_total - y_minor], axis=-1)

    is_telomere = np.zeros(N, dtype=np.int64)
    breakpoint_idx = -np.ones(N, dtype=np.int64)
    breakpoint_orient = np.zeros(N, dtype=np.int64)
    all_pairs = rng.permutation(N - 1)
    tel_pairs = all_pairs[:num_telomeres]
    is_telomere[tel_pairs] = 1
    free_pairs = all_pairs[num_telomeres:]
    positions = free_pairs[:min(2 * num_breakpoints, len(free_pairs))]
    kk = 0
    for k in range(num_breakpoints):
        if 2 * k + 1 >= len(positions):
            break
        for p in (positions[2 * k], positions[2 * k + 1]):
            breakpoint_idx[p] = k
            breakpoint_orient[p] = rng.choice([-1, 1])
        kk += 1

    return dict(
        num_clones=M,
        num_segments=N,
        num_breakpoints=kk,
        normal_contamination=normal_contamination,
        cn_states=cn_states,
        brk_states=brk_states,
        h_init=h,
        l=l / 1e6,
        x=x_total,
        y=y,
        is_telomere=is_telomere,
        breakpoint_idx=breakpoint_idx,
        breakpoint_orient=breakpoint_orient,
        transition_penalty=transition_penalty,
        divergence_weight=divergence_weight,
    )


def make_oracle(**kwargs):
    return OracleModel(**make_problem(**kwargs))


def brute_force_chain(framelogprob, log_transmat):
    """Exact chain quantities by enumerating all state sequences.

    Returns (log_norm_const, marginals (N,S), joint_marginals (N-1,S,S),
    map_sequence).
    """
    import itertools
    N, S = framelogprob.shape
    log_joint = {}
    best_seq, best_lp = None, -np.inf
    for seq in itertools.product(range(S), repeat=N):
        lp = framelogprob[0, seq[0]]
        for n in range(1, N):
            lp += log_transmat[n - 1, seq[n - 1], seq[n]] + framelogprob[n, seq[n]]
        log_joint[seq] = lp
        if lp > best_lp:
            best_lp, best_seq = lp, seq

    lps = np.array(list(log_joint.values()))
    vmax = lps.max()
    log_norm = np.log(np.sum(np.exp(lps - vmax))) + vmax

    marginals = np.zeros((N, S))
    joints = np.zeros((N - 1, S, S))
    for seq, lp in log_joint.items():
        p = np.exp(lp - log_norm)
        for n in range(N):
            marginals[n, seq[n]] += p
        for n in range(N - 1):
            joints[n, seq[n], seq[n + 1]] += p

    return log_norm, marginals, joints, np.array(best_seq)
