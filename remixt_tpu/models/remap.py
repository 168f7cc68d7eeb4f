"""Segmentation remap: insert zero-length dummy segments at breakends.

The breakpoint factor graph allows only a single breakend interposed between
each pair of adjacent segments; where multiple breakends meet at one junction
(or a breakend abuts a telomere), zero-length dummy segments are inserted.
Host-side index gymnastics, ported with its invariant asserts from
/root/reference/remixt/cn_model.py:82-167.
"""

import collections

import numpy as np


def get_brkend_seg_orient(breakend):
    """Map a (segment, side) breakend to (left segment of junction, orientation).

    Reference: cn_model.py:14-22.
    """
    n, side = breakend
    if side == 1:
        n_left = n
        orient = +1
    elif side == 0:
        n_left = n - 1
        orient = -1
    else:
        raise ValueError('side must be 0 or 1')
    return n_left, orient


class SegmentRemap:
    """Remapped segmentation with per-junction breakend assignment.

    Attributes:
        N, N1: original and remapped segment counts
        seg_fwd_remap: (N,) index of each original segment in the remap
        seg_rev_remap: (N1,) original segment index for each remapped segment
        seg_is_original: (N1,) bool
        is_telomere: (N1,) 1 where the transition out of the segment is free
        breakpoint_idx: (N1,) breakpoint id whose breakend follows the
            segment, or -1
        breakpoint_orient: (N1,) breakend orientation
    """

    def __init__(self, N, adjacencies, breakpoints):
        """
        Args:
            N: number of original segments
            adjacencies: set of (n, n+1) wild-type adjacent segment pairs
            breakpoints: sequence of frozensets of (segment, side) breakend pairs
        """
        self.N = N
        breakpoints = list(breakpoints)

        breakpoint_segment = collections.defaultdict(set)
        for bp_idx, breakpoint in enumerate(breakpoints):
            for be_idx, breakend in enumerate(breakpoint):
                n, orient = get_brkend_seg_orient(breakend)
                breakpoint_segment[n].add((bp_idx, be_idx, orient))

        # count segments in the new segmentation (cn_model.py:92-99)
        N1 = 0
        for n in range(-1, N):
            if n in breakpoint_segment:
                N1 += len(breakpoint_segment[n])
                if (n, n + 1) not in adjacencies:
                    N1 += 1
            elif n >= 0:
                N1 += 1
        self.N1 = N1

        self.seg_fwd_remap = np.zeros(N, dtype=int)
        self.seg_is_original = np.zeros(N1, dtype=bool)
        self.seg_rev_remap = np.zeros(N1, dtype=int)

        self.num_breakpoints = len(breakpoints)
        self.is_telomere = np.ones(N1, dtype=int)
        self.breakpoint_idx = -np.ones(N1, dtype=int)
        self.breakpoint_orient = np.zeros(N1, dtype=int)

        n_new = 0
        # there may be a breakend before the first segment (n = -1)
        for n in range(-1, N):
            if n >= 0:
                self.seg_fwd_remap[n] = n_new
                self.seg_is_original[n_new] = True

            if n in breakpoint_segment:
                for bp_idx, be_idx, orient in breakpoint_segment[n]:
                    self.breakpoint_idx[n_new] = bp_idx
                    self.breakpoint_orient[n_new] = orient
                    self.seg_rev_remap[n_new] = n

                    # breakend-incident junctions are not telomeres
                    self.is_telomere[n_new] = 0
                    n_new += 1

                # a breakend at a telomere needs one extra segment to carry
                # the free transition
                if (n, n + 1) not in adjacencies:
                    self.is_telomere[n_new] = 1
                    self.seg_rev_remap[n_new] = n
                    n_new += 1

            elif n >= 0:
                if (n, n + 1) in adjacencies:
                    self.is_telomere[n_new] = 0
                self.seg_rev_remap[n_new] = n
                n_new += 1

        assert n_new == N1
        assert not np.any((self.breakpoint_idx >= 0) & (self.is_telomere == 1))
        if self.num_breakpoints > 0:
            assert np.all(np.bincount(self.breakpoint_idx[self.breakpoint_idx >= 0]) == 2)

    def expand_data(self, x, l):
        """Scatter original per-segment data into the remapped segmentation;
        dummy segments get zeros (cn_model.py:163-167)."""
        x = np.asarray(x)
        l = np.asarray(l)
        x1 = np.zeros((self.N1,) + x.shape[1:], dtype=float)
        l1 = np.zeros(self.N1, dtype=float)
        x1[self.seg_fwd_remap] = x
        l1[self.seg_fwd_remap] = l
        return x1, l1
