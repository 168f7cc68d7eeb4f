"""Vectorized genomic interval algorithms.

API parity with /root/reference/remixt/segalg.py:5-400 (searchsorted-based
interval containment/overlap, concatenated ranges, segmentation reindexing,
adjacent-segment aggregation). Each optimized routine keeps a plain
``*_unopt`` mirror used by randomized equivalence tests, following the
reference's naive-vs-optimized test pattern.
"""

import numpy as np
import pandas as pd


def is_contained(a, b):
    """True when segment b is fully contained within segment a."""
    return b[0] >= a[0] and b[1] <= a[1]


def contained_counts_unopt(X, Y):
    """Counts of Y segments fully contained in non-overlapping X segments
    (naive reference)."""
    C = np.zeros(X.shape[0])
    for x_idx, x in enumerate(X):
        for y in Y:
            if y[0] >= x[0] and y[1] <= x[1]:
                C[x_idx] += 1
    return C


def contained_counts(X, Y):
    """Counts of Y segments fully contained in non-overlapping X segments.

    X must be sorted by start position; X segments must not overlap.
    """
    idx = np.searchsorted(X[:, 1], Y[:, 0])
    end_idx = np.searchsorted(X[:, 1], Y[:, 1])

    outside = end_idx >= X.shape[0]
    idx[outside] = 0

    idx = idx[
        (Y[:, 0] >= X[idx, 0]) &
        (Y[:, 1] <= X[idx, 1]) &
        (idx == end_idx) &
        (~outside)
    ]

    return np.bincount(idx, minlength=X.shape[0])


def overlapping_counts(X, Y):
    """Counts of Y segments overlapping each position in X: position X[i] is
    counted for y when y[0] < X[i] < y[1].

    X positions sorted; Y sorted by start.
    """
    lo = np.searchsorted(X, Y[:, 0], side='right')
    hi = np.searchsorted(X, Y[:, 1], side='left')
    delta = np.zeros(X.shape[0] + 1)
    np.add.at(delta, lo, 1)
    np.add.at(delta, hi, -1)
    return np.cumsum(delta[:-1])


def find_contained_positions_unopt(X, Y):
    """Index into X of the segment containing each position (naive)."""
    M = [-1] * Y.shape[0]
    for x_idx, x in enumerate(X):
        for y_idx in range(Y.shape[0]):
            if Y[y_idx] >= x[0] and Y[y_idx] < x[1]:
                assert M[y_idx] == -1
                M[y_idx] = x_idx
    return M


def find_contained_positions(X, Y):
    """Index into non-overlapping sorted X of the segment containing each
    position in Y; -1 where uncontained."""
    idx = np.searchsorted(X[:, 1], Y, side='right')

    mask = idx < X.shape[0]
    idx[~mask] = -1

    mask = mask & (Y >= X[idx, 0]) & (Y < X[idx, 1])
    idx[~mask] = -1

    return idx


def find_contained_segments_unopt(X, Y):
    """Index into X of the segment containing each Y segment (naive)."""
    M = [-1] * Y.shape[0]
    for x_idx, x in enumerate(X):
        for y_idx in range(Y.shape[0]):
            if Y[y_idx, 0] >= x[0] and Y[y_idx, 1] <= x[1]:
                assert M[y_idx] == -1
                M[y_idx] = x_idx
    return M


def find_contained_segments(X, Y):
    """Index into non-overlapping sorted X of the segment fully containing
    each Y segment; -1 where uncontained."""
    idx = np.searchsorted(X[:, 0], Y[:, 0], side='right') - 1
    idx_end = np.searchsorted(X[:, 1], Y[:, 1], side='left')

    mask = idx == idx_end
    idx[~mask] = -1

    return idx


def vrange(starts, lengths):
    """Concatenated integer ranges: [s, s+len) for each (start, length)."""
    cat_start = np.repeat(starts, lengths)
    cat_counter = np.arange(lengths.sum()) - np.repeat(lengths.cumsum() - lengths, lengths)
    return cat_start + cat_counter


def interval_position_overlap(intervals, positions):
    """Map (possibly overlapping) intervals to contained sorted positions.

    Returns (interval_idx, position_idx) pairs of equal length.
    """
    start_pos_idx = np.searchsorted(positions, intervals[:, 0])
    end_pos_idx = np.searchsorted(positions, intervals[:, 1])

    lengths = end_pos_idx - start_pos_idx

    interval_idx = np.repeat(np.arange(len(lengths)), lengths)
    position_idx = vrange(start_pos_idx, lengths)

    return interval_idx, position_idx


def interval_position_overlap_unopt(intervals, positions):
    """Naive mirror of interval_position_overlap."""
    interval_idx, position_idx = [], []
    for i, (s, e) in enumerate(intervals):
        for j, p in enumerate(positions):
            if s <= p < e:
                interval_idx.append(i)
                position_idx.append(j)
    return np.array(interval_idx, dtype=int), np.array(position_idx, dtype=int)


def reindex_segments(cn_1, cn_2):
    """Reindex two segmentations to their common refinement.

    Returns a dataframe with columns 'chromosome', 'start', 'end', 'idx_1',
    'idx_2' where idx_* index the input tables' rows covering each refined
    sub-segment.
    """
    if len(cn_1.index) == 0 or len(cn_2.index) == 0:
        empty = pd.DataFrame(columns=['chromosome', 'start', 'end', 'idx_1', 'idx_2'])
        for col in ['start', 'end', 'idx_1', 'idx_2']:
            empty[col] = empty[col].astype(int)
        empty['chromosome'] = empty['chromosome'].astype(str)
        return empty

    reseg = []

    for chromosome, chrom_cn_1 in cn_1.groupby('chromosome'):
        chrom_cn_2 = cn_2[cn_2['chromosome'] == chromosome]
        if len(chrom_cn_2.index) == 0:
            continue

        boundaries = np.sort(np.unique(np.concatenate([
            chrom_cn_1['start'].values,
            chrom_cn_1['end'].values,
            chrom_cn_2['start'].values,
            chrom_cn_2['end'].values,
        ])))

        chrom_reseg = pd.DataFrame({
            'start': boundaries[:-1],
            'end': boundaries[1:],
        })

        keep = np.ones(len(chrom_reseg.index), dtype=bool)
        idx_cols = {}
        for suffix, chrom_cn in zip(('_1', '_2'), (chrom_cn_1, chrom_cn_2)):
            start_idx = np.searchsorted(
                chrom_cn['start'].values, chrom_reseg['start'].values,
                side='right') - 1
            end_idx = np.searchsorted(
                chrom_cn['end'].values, chrom_reseg['end'].values,
                side='left')
            ok = (start_idx == end_idx) & (start_idx >= 0) & (start_idx < len(chrom_cn.index))
            keep &= ok
            idx_cols[suffix] = (start_idx, chrom_cn.index.values)

        chrom_reseg = chrom_reseg[keep]
        for suffix, (start_idx, index_values) in idx_cols.items():
            chrom_reseg['idx' + suffix] = index_values[start_idx[keep]]
        chrom_reseg['chromosome'] = chromosome

        reseg.append(chrom_reseg)

    if not reseg:
        return reindex_segments(pd.DataFrame(columns=cn_1.columns),
                                pd.DataFrame(columns=cn_2.columns))
    return pd.concat(reseg, ignore_index=True)


def aggregate_adjacent(cnv, value_cols=None, stable_cols=None,
                       length_normalized_cols=None):
    """Merge runs of adjacent segments with equal copy-number state.

    value_cols define state equality; stable_cols carry over from the run's
    first row; length_normalized_cols are length-weighted averages.
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

    cnv = cnv.copy()
    cnv['chromosome_index'] = np.searchsorted(
        np.unique(cnv['chromosome']), cnv['chromosome'])
    diff = cnv[['chromosome_index'] + value_cols].diff().abs().sum(axis=1)
    cnv['cn_group'] = (diff != 0).cumsum()

    def agg_segments(df):
        a = df[stable_cols].iloc[0].copy()
        a['start'] = df['start'].min()
        a['end'] = df['end'].max()
        a['length'] = df['length'].sum()
        for col in length_normalized_cols:
            a[col] = (df[col] * df['length']).sum() / (df['length'].sum() + 1e-16)
        return a

    return cnv.groupby('cn_group').apply(agg_segments)
