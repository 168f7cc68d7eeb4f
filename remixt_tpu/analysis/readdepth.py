"""Fit initialization machinery: read-depth modes and candidate haploid depths.

Mirrors /root/reference/remixt/analysis/readdepth.py:12-147 — depth table,
k-means modes of the minor-allele depth distribution, candidate monoclonal
haploid depths, ploidy estimation.
"""

import numpy as np

import sklearn.cluster

import remixt_tpu.utils
import remixt_tpu.likelihood
import remixt_tpu.analysis.experiment


def calculate_depth(experiment):
    """Minor/major/total depth table for high-quality segments
    (readdepth.py:12-57)."""
    data = remixt_tpu.analysis.experiment.create_segment_table(experiment)

    data['segment_length'] = data['end'] - data['start'] + 1
    data['length_ratio'] = data['length'] / data['segment_length']
    data['allele_readcount'] = data['minor_readcount'] + data['major_readcount']

    data['high_quality'] = (
        (data['length'] > np.percentile(data['length'].values, 10)) &
        (data['allele_readcount'] > np.percentile(data['allele_readcount'].values, 10)) &
        (data['length_ratio'] > np.percentile(data['length_ratio'].values, 10)))

    phi = remixt_tpu.likelihood.estimate_phi(experiment.x)
    p = remixt_tpu.likelihood.proportion_measureable_matrix(phi)

    # filter segments for which depth calculation would be nan/inf
    data = data[(data['length'] > 0) & np.all(p > 0, axis=1)]

    data.rename(columns={
        'major_depth': 'major',
        'minor_depth': 'minor',
        'total_depth': 'total',
    }, inplace=True)

    return data[[
        'chromosome', 'start', 'end', 'length',
        'major', 'minor', 'total', 'high_quality',
    ]]


def calculate_minor_modes(read_depth, num_clusters=5, min_cluster_prop=0.01):
    """K-means modes of the minor-allele depth distribution
    (readdepth.py:60-87)."""
    amp_rd = np.percentile(read_depth['minor'], 95)
    read_depth = read_depth[read_depth['minor'] < amp_rd]

    rd_samples = remixt_tpu.utils.weighted_resample(
        read_depth['minor'].values, read_depth['length'].values)
    kmm = sklearn.cluster.KMeans(n_clusters=num_clusters, n_init=10)
    kmm.fit(rd_samples.reshape((rd_samples.size, 1)))
    means = kmm.cluster_centers_[:, 0]

    cluster_idx = kmm.predict(rd_samples.reshape((rd_samples.size, 1)))
    cluster_counts = np.bincount(cluster_idx)
    cluster_prop = cluster_counts.astype(float) / cluster_counts.sum()
    means = means[cluster_prop >= min_cluster_prop]

    return means


def calculate_candidate_h_monoclonal(minor_modes, h_normal=None, h_tumour=None):
    """Candidate (normal, tumour) haploid depth pairs from minor modes
    (readdepth.py:90-124)."""
    minor_modes = np.asarray(minor_modes)

    if h_normal is None:
        h_normal = minor_modes.min()

    if h_tumour is not None:
        return np.array([[h_normal, h_tumour]])

    h_candidates = []
    for h_t in minor_modes:
        if h_t <= h_normal:
            continue
        h_t = h_t - h_normal

        # the first minor mode may represent 2 minor copies
        for scale in (1., 0.5):
            h_candidates.append(np.array([h_normal, h_t * scale]))

    return h_candidates


def estimate_ploidy(h, experiment):
    """Length-weighted mean total raw copy number for a candidate h
    (readdepth.py:127-147)."""
    read_depth = calculate_depth(experiment)

    major_raw = (read_depth['major'] - h[0]) / h[1:].sum()
    minor_raw = (read_depth['minor'] - h[0]) / h[1:].sum()

    data = read_depth.assign(major_raw=major_raw, minor_raw=minor_raw)
    data = data.replace(np.inf, np.nan).dropna()
    major, minor, length = data[['major_raw', 'minor_raw', 'length']].values.T
    return ((major + minor) * length).sum() / length.sum()
