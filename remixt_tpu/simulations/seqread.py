"""Read-level simulation: sample fragments on rearranged genomes, remap to
reference coordinates, intersect SNPs, emit seqdata.

Mirrors /root/reference/remixt/simulations/seqread.py:9-390 — fragment
interval sampling on the concatenated rearranged genome, orientation-aware
remapping through the segment table, SNP overlap with base-call errors, and
resampling of real reads to simulated depths.
"""

import collections

import numpy as np
import pandas as pd

import remixt_tpu.segalg
import remixt_tpu.seqdataio


def simulate_fragment_intervals(genome_length, num_fragments, read_length,
                                fragment_mean, fragment_stddev):
    """Uniform starts, normal lengths, filtered to fit the genome
    (seqread.py:9-40)."""
    start = np.sort(np.random.randint(0, high=genome_length, size=num_fragments))
    length = (fragment_stddev * np.random.randn(num_fragments)
              + fragment_mean).astype(int)

    is_filtered = (length < read_length) | (start + length >= genome_length)
    return start[~is_filtered], length[~is_filtered]


def segment_remap(segments, positions):
    """Remap positions on a concatenation of segments back into segment
    coordinates (seqread.py:44-80)."""
    seg_length = segments[:, 1] - segments[:, 0]
    remap_end = seg_length.cumsum()
    remap_start = remap_end - seg_length

    if np.any(positions > seg_length.sum()):
        raise ValueError('positions should be less than total segment length')

    pos_seg_idx = np.searchsorted(remap_end, positions, side='right')
    remap_pos = segments[pos_seg_idx, 0] + positions - remap_start[pos_seg_idx]

    return pos_seg_idx, remap_pos


def _create_segment_table(genome):
    """Flat table of segment copies in rearranged order (seqread.py:83-118);
    the array-coded genome decodes this vectorized."""
    return genome.segment_copy_table()


def _overlap_snps(fragments, chrom_snps, read_length, base_call_error):
    """SNPs covered by the paired reads of each fragment, with base-call
    errors applied (seqread.py:210-240)."""
    fragment_idx, snp_idx = remixt_tpu.segalg.interval_position_overlap(
        fragments[['start', 'end']].values,
        chrom_snps['position'].values)

    fragment_snps = pd.DataFrame({'snp_idx': snp_idx, 'fragment_idx': fragment_idx})
    fragment_snps = fragment_snps.merge(
        fragments, left_on='fragment_idx', right_index=True)
    fragment_snps = fragment_snps.merge(
        chrom_snps, left_on='snp_idx', right_index=True)

    # keep SNPs covered by either read end
    fragment_snps = fragment_snps[
        (fragment_snps['position'] < fragment_snps['start'] + read_length) |
        (fragment_snps['position'] >= fragment_snps['end'] - read_length)
    ]

    fragment_snps['is_alt'] = np.where(
        fragment_snps['allele'] == 0,
        fragment_snps['is_alt_0'],
        fragment_snps['is_alt_1'],
    )

    base_error = np.random.choice(
        [True, False], size=len(fragment_snps.index),
        p=[base_call_error, 1. - base_call_error])
    fragment_snps['is_alt'] = np.where(
        base_error, 1 - fragment_snps['is_alt'], fragment_snps['is_alt'])

    return fragment_snps


def simulate_mixture_read_data(read_data_filename, genomes, read_depths, snps,
                               params):
    """Simulate seqdata for a mixture of rearranged genomes
    (seqread.py:120-246)."""
    writer = remixt_tpu.seqdataio.Writer(read_data_filename)

    chromosome_fragment_id_start = collections.Counter()

    for genome, read_depth in zip(genomes, read_depths):
        segment_data = _create_segment_table(genome)

        # negate/flip remapped coordinates for reverse-orientation segments
        rev_mask = segment_data['orientation'] != 1
        rev_cols = ['start', 'end']
        segment_data.loc[rev_mask, rev_cols] = (
            -segment_data.loc[rev_mask, rev_cols[::-1]].values)

        tumour_genome_length = segment_data['length'].sum()
        num_fragments = int(tumour_genome_length * read_depth)

        num_fragments_created = 0
        fragments_per_chunk = 40000000
        while num_fragments_created < num_fragments:
            fragment_start, fragment_length = simulate_fragment_intervals(
                tumour_genome_length,
                min(fragments_per_chunk, num_fragments - num_fragments_created),
                params['read_length'],
                params['fragment_mean'],
                params['fragment_stddev'],
            )
            fragment_data = pd.DataFrame(
                {'start': fragment_start, 'length': fragment_length})

            # remap both ends to reference coordinates
            fragment_data['segment_idx'], fragment_data['end'] = segment_remap(
                segment_data[['start', 'end']].values,
                fragment_data['start'] + fragment_data['length'])
            fragment_data['segment_idx'], fragment_data['start'] = segment_remap(
                segment_data[['start', 'end']].values,
                fragment_data['start'])

            # drop fragments spanning segment boundaries
            fragment_data = fragment_data[
                (fragment_data['end'] - fragment_data['start'])
                == fragment_data['length']]

            # unflip reversed fragments
            fragment_data['start'] = np.where(
                fragment_data['start'] < 0,
                -fragment_data['start'] - fragment_data['length'],
                fragment_data['start'])
            fragment_data['end'] = fragment_data['start'] + fragment_data['length']
            fragment_data = fragment_data.drop('length', axis=1)

            fragment_data = fragment_data.set_index('segment_idx')
            fragment_data['allele'] = segment_data['allele'].reindex(fragment_data.index)

            fragment_data = dict(list(
                fragment_data.groupby(segment_data['chromosome'])))

            for chromosome, chrom_fragments in fragment_data.items():
                chrom_fragments = chrom_fragments.reset_index(drop=True)
                chrom_fragments['fragment_id'] = np.arange(len(chrom_fragments.index))
                chrom_fragments['fragment_id'] += chromosome_fragment_id_start[chromosome]
                chromosome_fragment_id_start[chromosome] += len(chrom_fragments.index)

                chrom_snps = snps['/chromosome_{}'.format(chromosome)]

                fragment_snps = _overlap_snps(
                    chrom_fragments, chrom_snps,
                    params['read_length'], params['base_call_error'])

                writer.write(chromosome, chrom_fragments, fragment_snps)
                num_fragments_created += len(chrom_fragments.index)

    writer.close()


def _get_segment_fragments(chrom_read_depth_data, source_filename, chromosome):
    """Source fragments annotated with per-segment/allele target read depth
    (seqread.py:249-269)."""
    source_fragments = remixt_tpu.seqdataio.read_fragment_data(
        source_filename, chromosome)

    segment_data = (chrom_read_depth_data[['start', 'end']]
                    .drop_duplicates().sort_values('start').reset_index(drop=True))
    segment_data['segment_idx'] = np.arange(len(segment_data.index))
    chrom_read_depth_data = chrom_read_depth_data.merge(segment_data)

    source_fragments['segment_idx'] = remixt_tpu.segalg.find_contained_segments(
        segment_data[['start', 'end']].values,
        source_fragments[['start', 'end']].values)
    source_fragments = source_fragments[source_fragments['segment_idx'] >= 0]

    # note: duplicates source fragments per allele
    source_fragments = source_fragments.merge(
        chrom_read_depth_data[['segment_idx', 'allele', 'read_depth']])

    return source_fragments


def resample_mixture_read_data(read_data_filename, source_filename, genomes,
                               read_depths, snps, params):
    """Resample real reads to simulated per-segment depths
    (seqread.py:272-390)."""
    read_depth_data = []
    for genome_idx, genome in enumerate(genomes):
        genome_table = _create_segment_table(genome)
        genome_table['genome_idx'] = genome_idx
        read_depth_data.append(genome_table)
    read_depth_data = pd.concat(read_depth_data, ignore_index=True)

    read_depth_data = (
        read_depth_data
        .groupby(['chromosome', 'start', 'end', 'allele', 'genome_idx'])
        .size().rename('copies').reset_index())
    read_depth_data = read_depth_data.merge(pd.DataFrame(
        list(enumerate(read_depths)),
        columns=['genome_idx', 'haploid_read_depth']))
    read_depth_data['read_depth'] = (
        read_depth_data['copies'] * read_depth_data['haploid_read_depth'])
    read_depth_data = (
        read_depth_data
        .groupby(['chromosome', 'start', 'end', 'allele'])['read_depth']
        .sum().reset_index())

    read_depth_data['length'] = read_depth_data['end'] - read_depth_data['start']
    total_reads = (read_depth_data['length'] * read_depth_data['read_depth']).sum()

    sum_source_depth = 0.
    for chromosome, chrom_data in read_depth_data.groupby('chromosome'):
        sum_source_depth += _get_segment_fragments(
            chrom_data, source_filename, chromosome)['read_depth'].sum()

    writer = remixt_tpu.seqdataio.Writer(read_data_filename)
    chromosome_fragment_id_start = collections.Counter()

    for chromosome, chrom_data in read_depth_data.groupby('chromosome'):
        source_fragments = _get_segment_fragments(
            chrom_data, source_filename, chromosome)

        source_fragments['expected_resample_count'] = (
            source_fragments['read_depth'] * total_reads / sum_source_depth)
        source_fragments['resample_count'] = np.random.poisson(
            source_fragments['expected_resample_count'].values)

        sampled_fragments = pd.DataFrame(
            np.repeat(
                source_fragments[['start', 'end', 'allele']].values,
                source_fragments['resample_count'].values,
                axis=0),
            columns=['start', 'end', 'allele']).astype(int)

        sampled_fragments = sampled_fragments.reset_index(drop=True)
        sampled_fragments['fragment_id'] = np.arange(len(sampled_fragments.index))
        sampled_fragments['fragment_id'] += chromosome_fragment_id_start[chromosome]
        chromosome_fragment_id_start[chromosome] += len(sampled_fragments.index)

        chrom_snps = snps['/chromosome_{}'.format(chromosome)][
            ['position', 'is_alt_0', 'is_alt_1']]

        fragment_snps = _overlap_snps(
            sampled_fragments, chrom_snps,
            params['read_length'], params['base_call_error'])

        writer.write(chromosome, sampled_fragments, fragment_snps)

    writer.close()
