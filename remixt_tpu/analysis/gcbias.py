"""GC and mappability bias model.

Mirrors /root/reference/remixt/analysis/gcbias.py:12-322 — random-position
read-start sampling, LOWESS GC curve (own robust local-linear implementation;
statsmodels is absent here), and the per-segment expected-bias integral over
the fragment-length distribution × GC curve × mappability, which rescales
segment length into the effective length used by the likelihood.
"""

import numpy as np
import pandas as pd
import scipy.stats
import h5py

import remixt_tpu.config
import remixt_tpu.seqdataio
import remixt_tpu.utils


def lowess(y, x, frac=0.2, it=3):
    """Robust locally-weighted linear regression (LOWESS).

    Tricube distance weights over a bandwidth of ``frac`` of the data,
    ``it`` robustifying iterations with bisquare residual weights. Matches
    statsmodels' lowess output closely on smooth binned data (the only use
    here is the 101-bin GC curve).
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    n = len(x)
    r = max(int(np.ceil(frac * n)), 2)

    delta = np.ones(n)
    smoothed = np.zeros(n)
    for _ in range(it + 1):
        for i in range(n):
            dist = np.abs(x - x[i])
            idx = np.argsort(dist)[:r]
            dmax = dist[idx].max()
            if dmax == 0:
                smoothed[i] = np.average(y[idx], weights=delta[idx] + 1e-12)
                continue
            w = (1 - (dist[idx] / dmax) ** 3) ** 3
            w = np.clip(w, 0, None) * delta[idx]
            if w.sum() <= 0:
                smoothed[i] = y[i]
                continue
            xw = x[idx]
            # weighted linear fit evaluated at x[i]
            wsum = w.sum()
            xm = (w * xw).sum() / wsum
            ym = (w * y[idx]).sum() / wsum
            cov = (w * (xw - xm) * (y[idx] - ym)).sum()
            var = (w * (xw - xm) ** 2).sum()
            beta = cov / var if var > 0 else 0.0
            smoothed[i] = ym + beta * (x[i] - xm)

        resid = y - smoothed
        s = np.median(np.abs(resid))
        if s <= 0:
            break
        delta = np.clip(resid / (6.0 * s), -1, 1)
        delta = (1 - delta ** 2) ** 2

    return smoothed


def sample_gc(gc_samples_filename, seqdata_filename, fragment_length, config,
              ref_data_dir):
    """Sample random genome positions; record GC in the fragment window,
    mappability, and observed read starts (gcbias.py:12-129)."""
    chromosomes = remixt_tpu.config.get_chromosomes(config, ref_data_dir)
    chromosome_lengths = remixt_tpu.config.get_chromosome_lengths(config, ref_data_dir)
    num_samples = remixt_tpu.config.get_param(config, 'sample_gc_num_positions')
    position_offset = remixt_tpu.config.get_param(config, 'gc_position_offset')
    genome_fasta = remixt_tpu.config.get_filename(config, ref_data_dir, 'genome_fasta')
    mappability_filename = remixt_tpu.config.get_filename(config, ref_data_dir, 'mappability')
    filter_duplicates = remixt_tpu.config.get_param(config, 'filter_duplicates')
    map_qual_threshold = remixt_tpu.config.get_param(config, 'map_qual_threshold')

    fragment_length = int(fragment_length)
    gc_window = fragment_length - 2 * position_offset

    chrom_info = pd.DataFrame({'chrom_length': chromosome_lengths})
    chrom_info['chrom_end'] = chrom_info['chrom_length'].cumsum()
    chrom_info['chrom_start'] = chrom_info['chrom_end'] - chrom_info['chrom_length']

    genome_length = chrom_info['chrom_length'].sum()
    sample_pos = np.sort(np.random.randint(0, genome_length, num_samples))

    sample_gc_count = np.zeros(sample_pos.shape)
    sample_mappability = np.ones(sample_pos.shape)
    for chrom_id, sequence in remixt_tpu.utils.read_sequences(genome_fasta):
        if chrom_id not in chromosomes:
            continue

        mappability = read_mappability_indicator(
            mappability_filename, chrom_id, len(sequence), map_qual_threshold)

        chrom_start, chrom_end = chrom_info.loc[chrom_id, ['chrom_start', 'chrom_end']].values

        sequence = np.frombuffer(sequence.upper().encode(), dtype='S1')
        gc = (sequence == b'G') | (sequence == b'C')
        gc_count = gc.cumsum()
        gc_count = gc_count.astype(float)
        gc_count[gc_window:] = gc_count[gc_window:] - gc_count[:-gc_window]

        gc_count = np.concatenate([gc_count, np.ones(fragment_length) * np.nan])

        chrom_sample_idx = (sample_pos >= chrom_start) & (sample_pos < chrom_end)
        sample_chrom_pos = sample_pos[chrom_sample_idx] - chrom_start

        sample_mappability[chrom_sample_idx] *= mappability[sample_chrom_pos]

        chrom_window_end = sample_chrom_pos + fragment_length - position_offset - 1
        sample_gc_count[chrom_sample_idx] += gc_count[chrom_window_end]

    sample_filter = (sample_mappability > 0) & (~np.isnan(sample_gc_count))
    sample_pos = sample_pos[sample_filter]
    sample_gc_count = sample_gc_count[sample_filter]

    sample_gc_percent = sample_gc_count / float(gc_window)

    # observed read starts at sampled positions
    sample_read_count = np.zeros(sample_pos.shape, dtype=int)
    for chrom_id in remixt_tpu.seqdataio.read_chromosomes(seqdata_filename):
        if chrom_id not in chromosomes:
            continue

        reads_iter = remixt_tpu.seqdataio.read_fragment_data(
            seqdata_filename, chrom_id,
            filter_duplicates=filter_duplicates,
            map_qual_threshold=map_qual_threshold,
            chunksize=1000000)

        for chrom_reads in reads_iter:
            chrom_reads = chrom_reads.copy()
            chrom_reads['start'] += chrom_info.loc[chrom_id, 'chrom_start']
            sample_read_count += (
                chrom_reads
                .groupby('start')['end']
                .count()
                .reindex(sample_pos)
                .fillna(0)
                .astype(int)
                .values
            )

    sample_chrom_idx = np.searchsorted(
        chrom_info['chrom_end'].values, sample_pos, side='right')
    sample_chrom = chrom_info.index.values[sample_chrom_idx]
    sample_chrom_pos = sample_pos - chrom_info['chrom_start'].values[sample_chrom_idx]

    gc_sample_data = pd.DataFrame({
        'chromosome': sample_chrom,
        'position': sample_chrom_pos,
        'gc_percent': sample_gc_percent,
        'read_count': sample_read_count,
    })[['chromosome', 'position', 'gc_percent', 'read_count']]

    gc_sample_data.to_csv(gc_samples_filename, sep='\t', header=False, index=False)


def gc_lowess(gc_samples_filename, gc_dist_filename, gc_table_filename,
              gc_resolution=100):
    """Bin sampled positions by GC percent and fit the LOWESS read-rate curve
    (gcbias.py:132-160)."""
    gc_samples = pd.read_csv(
        gc_samples_filename, sep='\t',
        names=['chromosome', 'position', 'gc', 'count'],
        converters={'chromosome': str})

    gc_samples['gc_bin'] = (gc_samples['gc'] * gc_resolution).round()

    gc_binned = (
        gc_samples.groupby('gc_bin')['count']
        .agg(['sum', 'size', 'mean'])
        .rename(columns={'size': 'len'})
        .reindex(range(gc_resolution + 1))
        .fillna(0)
        .reset_index()
        .rename(columns={'index': 'gc_bin'})
        .astype(float)
    )

    gc_binned['smoothed'] = lowess(
        gc_binned['mean'].values, gc_binned['gc_bin'].values, frac=0.2)
    assert not gc_binned['smoothed'].isnull().any()

    rescale = 1. / gc_binned['smoothed'].max()
    gc_binned['mean'] = gc_binned['mean'] * rescale
    gc_binned['smoothed'] = gc_binned['smoothed'] * rescale

    gc_binned.to_csv(gc_table_filename, sep='\t', index=False)
    gc_binned[['smoothed']].to_csv(gc_dist_filename, sep='\t', index=False, header=False)


def read_mappability_indicator(mappability_filename, chromosome,
                               max_chromosome_length, map_qual_threshold):
    """Per-position mappability indicator from the mappability store
    (gcbias.py:163-175). Store layout: group ``chromosome_X`` with start/end/
    quality datasets (see remixt_tpu.mappability.tasks)."""
    with h5py.File(mappability_filename, 'r') as store:
        group = store['chromosome_' + chromosome]
        start = group['start'][()]
        end = group['end'][()]
        quality = group['quality'][()]

    keep = quality >= map_qual_threshold
    # difference-array interval fill: +1 at starts, -1 at ends, positive
    # running sum marks covered positions
    delta = np.zeros(max_chromosome_length + 1, dtype=np.int64)
    np.add.at(delta, np.minimum(start[keep], max_chromosome_length), 1)
    np.add.at(delta, np.minimum(end[keep], max_chromosome_length), -1)
    return (np.cumsum(delta[:-1]) > 0).astype(np.uint8)


def read_gc_cumsum(genome_fasta, chromosome):
    """GC cumulative sum over one chromosome sequence (gcbias.py:178-190)."""
    gc_cumsum = None
    for c, s in remixt_tpu.utils.read_sequences(genome_fasta):
        if c == chromosome:
            seq = np.frombuffer(s.upper().encode(), dtype='S1')
            gc_indicator = ((seq == b'G') | (seq == b'C')) * 1
            gc_cumsum = gc_indicator.cumsum()
    return gc_cumsum


class GCCurve(object):
    """Piecewise GC probability curve (gcbias.py:193-215)."""

    def read(self, gc_dist_filename):
        with open(gc_dist_filename, 'r') as f:
            self.gc_lowess = np.array(f.readlines(), dtype=float)
        self.gc_lowess /= self.gc_lowess.sum()
        self.cache = {}

    def predict(self, x):
        idx = np.clip(int(x * float(len(self.gc_lowess) - 1)), 0,
                      len(self.gc_lowess) - 1)
        return max(self.gc_lowess[idx], 0.0)

    def table(self, l):
        if l not in self.cache:
            self.cache[l] = np.array(
                [self.predict(float(x) / float(l)) for x in range(0, l + 1)])
        return self.cache[l]


def gc_map_bias(segment_filename, fragment_mean, fragment_stddev,
                gc_dist_filename, bias_filename, config, ref_data_dir):
    """Per-segment GC/mappability bias task (gcbias.py:218-225)."""
    segments = pd.read_csv(segment_filename, sep='\t',
                           converters={'chromosome': str})
    biases = calculate_gc_map_bias(
        segments, fragment_mean, fragment_stddev, gc_dist_filename,
        config, ref_data_dir)
    biases.to_csv(bias_filename, sep='\t', index=False)


def calculate_gc_map_bias(segments, fragment_mean, fragment_stddev,
                          gc_dist_filename, config, ref_data_dir):
    """Expected read-generation bias per segment (gcbias.py:228-259)."""
    do_gc = remixt_tpu.config.get_param(config, 'do_gc_correction')
    do_map = remixt_tpu.config.get_param(config, 'do_mappability_correction')

    position_offset = remixt_tpu.config.get_param(config, 'gc_position_offset')
    genome_fasta = remixt_tpu.config.get_filename(config, ref_data_dir, 'genome_fasta')
    mappability_filename = remixt_tpu.config.get_filename(config, ref_data_dir, 'mappability')
    map_qual_threshold = remixt_tpu.config.get_param(config, 'map_qual_threshold')
    read_length = remixt_tpu.config.get_param(config, 'mappability_length')

    gc_dist = GCCurve()
    gc_dist.read(gc_dist_filename)

    fragment_dist = scipy.stats.norm(fragment_mean, fragment_stddev)
    fragment_min = int(fragment_dist.ppf(0.01) - 1.)
    fragment_max = int(fragment_dist.ppf(0.99) + 1.)
    fragment_step = 10

    for chromosome, chrom_seg in segments.groupby('chromosome', sort=False):
        gc_cumsum = read_gc_cumsum(genome_fasta, chromosome)
        chromosome_length = gc_cumsum.shape[0]
        mappability = read_mappability_indicator(
            mappability_filename, chromosome, chromosome_length, map_qual_threshold)

        for idx, (start, end) in chrom_seg[['start', 'end']].iterrows():
            segments.loc[idx, 'bias'] = calculate_segment_gc_map_bias(
                gc_cumsum[start:end], mappability[start:end],
                gc_dist, fragment_dist, fragment_min, fragment_max,
                fragment_step, position_offset, read_length,
                do_gc=do_gc, do_map=do_map)

    return segments


def _fragment_start_probabilities(gc_cumsum, mappability, gc_dist,
                                  fragment_length, position_offset,
                                  read_length, do_gc, do_map):
    """Per-start-position generation probability for one fragment length:
    GC-curve weight of the trimmed fragment window times the mappability of
    both read placements."""
    n_starts = gc_cumsum.shape[0] - fragment_length
    prob = np.ones(n_starts)

    if do_gc:
        window = fragment_length - 2 * position_offset
        window_gc = (
            gc_cumsum[fragment_length - position_offset:-position_offset]
            - gc_cumsum[position_offset:-fragment_length + position_offset])
        prob = prob * gc_dist.table(window)[window_gc]

    if do_map:
        mate_offset = fragment_length - read_length
        prob = prob * (mappability[:-fragment_length]
                       * mappability[mate_offset:-read_length])

    return prob


def calculate_segment_gc_map_bias(gc_cumsum, mappability, gc_dist,
                                  fragment_dist, fragment_min, fragment_max,
                                  fragment_step, position_offset, read_length,
                                  do_gc=True, do_map=True):
    """Expected read-generation bias of one segment: the integral over the
    fragment-length distribution of summed per-position probabilities
    (parity: reference gcbias.py:262-302)."""
    bias = 0.
    for fragment_length in range(fragment_min, fragment_max + 1,
                                 fragment_step):
        if fragment_length < read_length or (
                fragment_length >= gc_cumsum.shape[0]):
            continue
        start_probs = _fragment_start_probabilities(
            gc_cumsum, mappability, gc_dist, fragment_length,
            position_offset, read_length, do_gc, do_map)
        bias += fragment_dist.pdf(fragment_length) * start_probs.sum()
    return bias


def calculate_biased_length(segments):
    """Rescale segment length by normalized bias (gcbias.py:305-314)."""
    segments['bias'] /= segments['bias'].sum()
    segments['length'] = segments['bias'] * float(
        (segments['end'] - segments['start']).sum())
    return segments


def biased_length(length_filename, bias_filename):
    """Biased segment length task (gcbias.py:317-322)."""
    segments = pd.read_csv(bias_filename, sep='\t', converters={'chromosome': str})
    segments = calculate_biased_length(segments)
    segments.to_csv(length_filename, sep='\t', index=False)
