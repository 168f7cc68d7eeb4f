"""Vectorized genomic interval algorithms.

Capability parity with the reference interval library
(/root/reference/remixt/segalg.py:5-400): containment counts and lookups,
concatenated ranges, interval/position overlap, common-refinement
reindexing of two segmentations, and adjacent-segment aggregation.  Each
optimized routine keeps a plain ``*_unopt`` mirror used by randomized
equivalence tests (the reference's naive-vs-optimized pattern).

Containment lookups here search the *start* axis and validate against the
end; the refinement reindexer runs as a single vectorized pass over all
chromosomes using composite ``(chromosome_code << 42) | position`` keys;
aggregation uses grouped reductions instead of per-group Python apply.
"""

import numpy as np
import pandas as pd

_POS_BITS = 42  # genomic positions < 2^42 ~ 4.4e12


def composite_keys(codes, positions):
    """One sortable int64 key per (chromosome code, position) pair.

    Shared by the reindexer below and analysis/experiment's breakend
    matcher so the bit layout cannot drift between them.
    """
    return (np.asarray(codes).astype(np.int64) << _POS_BITS) \
        + np.asarray(positions).astype(np.int64)


def is_contained(a, b):
    """True when segment b is fully contained within segment a."""
    return b[0] >= a[0] and b[1] <= a[1]


def find_contained_positions(X, Y):
    """Index into non-overlapping start-sorted segments X of the segment
    containing each position in Y (half-open [start, end)); -1 where
    uncontained."""
    Y = np.asarray(Y)
    candidate = np.searchsorted(X[:, 0], Y, side='right') - 1
    safe = np.maximum(candidate, 0)
    hit = (candidate >= 0) & (Y < X[safe, 1])
    return np.where(hit, candidate, -1)


def find_contained_positions_unopt(X, Y):
    """Naive mirror of find_contained_positions."""
    out = [-1] * np.asarray(Y).shape[0]
    for x_idx, (start, end) in enumerate(X):
        for y_idx, pos in enumerate(Y):
            if start <= pos < end:
                assert out[y_idx] == -1
                out[y_idx] = x_idx
    return out


def find_contained_segments(X, Y):
    """Index into non-overlapping start-sorted X of the segment fully
    containing each Y segment; -1 where uncontained."""
    candidate = find_contained_positions(X, Y[:, 0])
    safe = np.maximum(candidate, 0)
    hit = (candidate >= 0) & (Y[:, 1] <= X[safe, 1])
    return np.where(hit, candidate, -1)


def find_contained_segments_unopt(X, Y):
    """Naive mirror of find_contained_segments."""
    out = [-1] * Y.shape[0]
    for x_idx, (start, end) in enumerate(X):
        for y_idx in range(Y.shape[0]):
            if Y[y_idx, 0] >= start and Y[y_idx, 1] <= end:
                assert out[y_idx] == -1
                out[y_idx] = x_idx
    return out


def contained_counts(X, Y):
    """Counts of Y segments fully contained in each of the non-overlapping
    start-sorted X segments."""
    owner = find_contained_segments(X, Y)
    return np.bincount(owner[owner >= 0], minlength=X.shape[0]).astype(float)


def contained_counts_unopt(X, Y):
    """Naive mirror of contained_counts."""
    counts = np.zeros(X.shape[0])
    for x_idx, x in enumerate(X):
        for y in Y:
            if is_contained(x, y):
                counts[x_idx] += 1
    return counts


def overlapping_counts(X, Y):
    """For each sorted position X[i], the number of Y segments with
    Y[:, 0] < X[i] < Y[:, 1], via a difference array."""
    enter = np.searchsorted(X, Y[:, 0], side='right')
    leave = np.searchsorted(X, Y[:, 1], side='left')
    delta = np.bincount(enter, minlength=X.shape[0] + 1)
    delta = delta - np.bincount(leave, minlength=X.shape[0] + 1)
    return np.cumsum(delta[:-1]).astype(float)


def vrange(starts, lengths):
    """Concatenated integer ranges [s, s + length) for each pair."""
    starts = np.asarray(starts)
    lengths = np.asarray(lengths)
    offsets = np.arange(lengths.sum()) - np.repeat(
        np.concatenate(([0], np.cumsum(lengths)[:-1])), lengths)
    return np.repeat(starts, lengths) + offsets


def interval_position_overlap(intervals, positions):
    """Pairs (interval_idx, position_idx) for every sorted position falling
    inside each (possibly overlapping) interval."""
    first = np.searchsorted(positions, intervals[:, 0])
    last = np.searchsorted(positions, intervals[:, 1])
    spans = last - first
    return np.repeat(np.arange(len(spans)), spans), vrange(first, spans)


def interval_position_overlap_unopt(intervals, positions):
    """Naive mirror of interval_position_overlap."""
    interval_idx, position_idx = [], []
    for i, (start, end) in enumerate(intervals):
        for j, pos in enumerate(positions):
            if start <= pos < end:
                interval_idx.append(i)
                position_idx.append(j)
    return (np.array(interval_idx, dtype=int),
            np.array(position_idx, dtype=int))


def _empty_reindex():
    empty = pd.DataFrame({
        'chromosome': pd.Series(dtype=str),
        'start': pd.Series(dtype=int),
        'end': pd.Series(dtype=int),
        'idx_1': pd.Series(dtype=int),
        'idx_2': pd.Series(dtype=int),
    })
    return empty


def reindex_segments(cn_1, cn_2):
    """Common refinement of two segment tables.

    Returns a table with columns chromosome/start/end/idx_1/idx_2: the
    refined sub-segments covered by BOTH inputs, with idx_* the covering
    row labels.  Vectorized over all chromosomes at once with composite
    (chromosome code, position) integer keys.
    """
    if len(cn_1.index) == 0 or len(cn_2.index) == 0:
        return _empty_reindex()

    all_chroms = pd.concat([cn_1['chromosome'].astype(str),
                            cn_2['chromosome'].astype(str)],
                           ignore_index=True)
    codes, chrom_names = pd.factorize(all_chroms)
    codes_1 = codes[:len(cn_1.index)].astype(np.int64)
    codes_2 = codes[len(cn_1.index):].astype(np.int64)

    # refined boundaries: every start/end of either table, per chromosome
    bounds = np.unique(np.concatenate([
        composite_keys(codes_1, cn_1['start'].values),
        composite_keys(codes_1, cn_1['end'].values),
        composite_keys(codes_2, cn_2['start'].values),
        composite_keys(codes_2, cn_2['end'].values),
    ]))
    lo, hi = bounds[:-1], bounds[1:]
    same_chrom = (lo >> _POS_BITS) == (hi >> _POS_BITS)
    lo, hi = lo[same_chrom], hi[same_chrom]

    # cover lookup: a refined piece [lo, hi) is covered by a table row when
    # one row's composite-keyed [start, end) contains it
    def cover(codes_arr, table):
        start_keys = composite_keys(codes_arr, table['start'].values)
        end_keys = composite_keys(codes_arr, table['end'].values)
        order = np.argsort(start_keys, kind='stable')
        pos = np.searchsorted(start_keys[order], lo, side='right') - 1
        safe = np.maximum(pos, 0)
        hit = (pos >= 0) & (hi <= end_keys[order][safe]) & (
            lo >= start_keys[order][safe])
        return np.where(hit, order[safe], -1)

    cover_1 = cover(codes_1, cn_1)
    cover_2 = cover(codes_2, cn_2)
    both = (cover_1 >= 0) & (cover_2 >= 0)
    if not both.any():
        return _empty_reindex()

    lo, hi = lo[both], hi[both]
    mask = (np.int64(1) << _POS_BITS) - 1
    return pd.DataFrame({
        'chromosome': chrom_names[(lo >> _POS_BITS)].astype(str),
        'start': lo & mask,
        'end': hi & mask,
        'idx_1': cn_1.index.values[cover_1[both]],
        'idx_2': cn_2.index.values[cover_2[both]],
    })


def aggregate_adjacent(cnv, value_cols=None, stable_cols=None,
                       length_normalized_cols=None):
    """Merge runs of adjacent segments sharing a copy-number state.

    value_cols define run equality; stable_cols carry the run's first
    value; length_normalized_cols become length-weighted means.  Grouped
    reductions throughout — no per-run Python.
    """
    if value_cols is None:
        value_cols = ['major_1', 'major_2', 'minor_1', 'minor_2']
    if stable_cols is None:
        stable_cols = [
            'chromosome',
            'major_1', 'major_2', 'minor_1', 'minor_2',
            'major_raw_e', 'minor_raw_e',
        ]
    if length_normalized_cols is None:
        length_normalized_cols = ['major_raw', 'minor_raw']

    chrom_code = pd.factorize(cnv['chromosome'])[0]
    state = np.column_stack([chrom_code] + [
        cnv[c].values for c in value_cols])
    is_new_run = np.concatenate(
        ([True], np.any(state[1:] != state[:-1], axis=1)))
    runs = np.cumsum(is_new_run)

    grouped = cnv.groupby(runs, sort=True)
    out = grouped[stable_cols].first()
    out['start'] = grouped['start'].min()
    out['end'] = grouped['end'].max()
    out['length'] = grouped['length'].sum()
    weighted = cnv[length_normalized_cols].multiply(cnv['length'], axis=0)
    for col in length_normalized_cols:
        out[col] = (weighted[col].groupby(runs).sum()
                    / (out['length'] + 1e-16))
    return out
