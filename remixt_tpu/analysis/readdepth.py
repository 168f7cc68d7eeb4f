"""Fit initialization machinery: read-depth modes and candidate haploid depths.

Capability parity with the reference init machinery
(/root/reference/remixt/analysis/readdepth.py:12-147): a per-segment depth
table restricted to usable segments, k-means modes of the length-weighted
minor-allele depth distribution, candidate monoclonal (normal, tumour)
haploid depth pairs, and a raw-copy-number ploidy estimate per candidate.
"""

import numpy as np
import sklearn.cluster

import remixt_tpu.likelihood
import remixt_tpu.utils


def calculate_depth(experiment):
    """Depth table: minor/major/total depth per segment with a
    ``high_quality`` indicator.

    A segment is high quality when its effective length, genotypable read
    count, and effective-to-genomic length ratio each clear the 10th
    percentile; rows where depths are undefined (zero effective length or
    zero genotypable proportion) are dropped.
    """
    x = np.asarray(experiment.x, dtype=float)
    l = np.asarray(experiment.l, dtype=float)
    genomic_span = (np.asarray(experiment.segment_end)
                    - np.asarray(experiment.segment_start) + 1)

    with np.errstate(invalid='ignore', divide='ignore'):
        allele_ratio = np.nan_to_num(x[:, 1] / (x[:, 0] + x[:, 1]))
        total = x[:, 2] / l
    minor = total * allele_ratio
    major = total * (1.0 - allele_ratio)

    quality_scores = {
        'length': l,
        'allele_readcount': x[:, 0] + x[:, 1],
        'length_ratio': l / genomic_span,
    }
    high_quality = np.ones(len(l), dtype=bool)
    for score in quality_scores.values():
        high_quality &= score > np.percentile(score, 10)

    phi = remixt_tpu.likelihood.estimate_phi(x)
    measurable = remixt_tpu.likelihood.proportion_measureable_matrix(phi)
    defined = (l > 0) & np.all(measurable > 0, axis=1)

    import pandas as pd
    table = pd.DataFrame({
        'chromosome': experiment.segment_chromosome_id,
        'start': experiment.segment_start,
        'end': experiment.segment_end,
        'length': l,
        'major': major,
        'minor': minor,
        'total': total,
        'high_quality': high_quality,
    })
    return table[defined]


def calculate_minor_modes(read_depth, num_clusters=5, min_cluster_prop=0.01):
    """Modes of the length-weighted minor-allele depth distribution.

    Depths above the 95th percentile (amplifications) are excluded, the
    remainder resampled proportional to segment length, clustered with
    k-means, and clusters holding under ``min_cluster_prop`` of the mass
    discarded.
    """
    minor = read_depth['minor'].values
    keep = minor < np.percentile(minor, 95)
    samples = remixt_tpu.utils.weighted_resample(
        minor[keep], read_depth['length'].values[keep])[:, None]

    kmeans = sklearn.cluster.KMeans(n_clusters=num_clusters, n_init=10)
    assignment = kmeans.fit_predict(samples)
    proportion = np.bincount(
        assignment, minlength=num_clusters) / float(len(assignment))
    return kmeans.cluster_centers_[proportion >= min_cluster_prop, 0]


def calculate_candidate_h_monoclonal(minor_modes, h_normal=None,
                                     h_tumour=None):
    """Candidate (normal, tumour) haploid depth pairs.

    The smallest mode is taken as the normal depth unless given; every
    higher mode yields two tumour-depth candidates — the mode offset
    itself, and half of it (the mode may correspond to two minor copies).
    """
    minor_modes = np.asarray(minor_modes)
    if h_normal is None:
        h_normal = minor_modes.min()
    if h_tumour is not None:
        return np.array([[h_normal, h_tumour]])

    offsets = minor_modes[minor_modes > h_normal] - h_normal
    return [np.array([h_normal, offset * scale])
            for offset in offsets
            for scale in (1.0, 0.5)]


def estimate_ploidy(h, experiment):
    """Length-weighted mean total raw copy number under candidate ``h``."""
    depth = calculate_depth(experiment)
    h = np.asarray(h, dtype=float)

    raw_total = (depth['major'].values + depth['minor'].values
                 - 2.0 * h[0]) / h[1:].sum()
    length = depth['length'].values
    finite = np.isfinite(raw_total)
    return float((raw_total[finite] * length[finite]).sum()
                 / length[finite].sum())
