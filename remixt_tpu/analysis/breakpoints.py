"""Fuzzy breakpoint matching between prediction sets.

Capability parity with /root/reference/remixt/analysis/breakpoints.py:18-91,
vectorized end to end: breakends join on (chromosome, strand) with a
positional window filter, and the two-breakend pairing consistency check is
a groupby-nunique instead of the reference's per-pair Python loop.
"""

import pandas as pd


def create_breakends(bp):
    """Long-form breakends: one row per (prediction, side) with columns
    prediction_id, prediction_side (0/1), chromosome, strand, position."""
    sides = []
    for side_idx, suffix in enumerate(('_1', '_2')):
        part = bp[['prediction_id', 'chromosome' + suffix,
                   'strand' + suffix, 'position' + suffix]].copy()
        part.columns = ['prediction_id', 'chromosome', 'strand', 'position']
        part['prediction_side'] = side_idx
        sides.append(part)
    return pd.concat(sides, ignore_index=True)[
        ['prediction_id', 'prediction_side', 'chromosome', 'strand',
         'position']]


def match_breakpoints(bp1, bp2, search_range=400):
    """Approximately equal breakpoints between two prediction sets.

    A pair matches when each of prediction 1's breakends has a same-
    (chromosome, strand) breakend of prediction 2 within ``search_range``,
    and the two pairings use distinct sides of both predictions.

    Returns a dataframe with columns prediction_id_1, prediction_id_2.
    """
    empty = pd.DataFrame(columns=['prediction_id_1', 'prediction_id_2'])
    if bp1.empty or bp2.empty:
        return empty

    paired = create_breakends(bp1).merge(
        create_breakends(bp2),
        on=['chromosome', 'strand'], suffixes=('_1', '_2'))
    paired = paired[
        (paired['position_1'] - paired['position_2']).abs() <= search_range]
    if paired.empty:
        return empty

    # a valid match pairs both sides of each prediction, each exactly once
    side_spans = paired.groupby(['prediction_id_1', 'prediction_id_2']).agg(
        num_pairings=('prediction_side_1', 'size'),
        sides_1=('prediction_side_1', 'nunique'),
        sides_2=('prediction_side_2', 'nunique'))
    complete = side_spans[(side_spans['num_pairings'] == 2)
                          & (side_spans['sides_1'] == 2)
                          & (side_spans['sides_2'] == 2)]
    return complete.reset_index()[['prediction_id_1', 'prediction_id_2']]
