"""Segmentation and segment read counting.

Mirrors /root/reference/remixt/analysis/segment.py:10-253 — regular-grid
segmentation with gap boundaries and breakend changepoints, per-chromosome
fragment counting via interval containment, and the merge of haplotype-block
allele counts into the final count table.
"""

import numpy as np
import pandas as pd

import remixt_tpu.config
import remixt_tpu.seqdataio
import remixt_tpu.segalg

GAP_TABLE_COLUMNS = [
    'bin', 'chromosome', 'start', 'end', 'ix', 'n', 'size', 'type', 'bridge',
]


def create_segments(segment_filename, config, ref_data_dir, breakpoint_filename=None):
    """Write the segmentation TSV: regular grid + gap boundaries + breakends
    (segment.py:10-121)."""
    segment_length = remixt_tpu.config.get_param(config, 'segment_length')
    chromosomes = remixt_tpu.config.get_chromosomes(config, ref_data_dir)
    chromosome_lengths = remixt_tpu.config.get_chromosome_lengths(config, ref_data_dir)
    gap_table_filename = remixt_tpu.config.get_filename(config, ref_data_dir, 'gap_table')
    chr_name_prefix = remixt_tpu.config.get_param(config, 'chr_name_prefix')

    gap_table = pd.read_csv(
        gap_table_filename, sep='\t', compression='gzip', header=None,
        names=GAP_TABLE_COLUMNS, converters={'chromosome': str})

    _check_chr_prefix(gap_table['chromosome'], chr_name_prefix)

    changepoints = []

    # regular grid
    for chromosome in chromosomes:
        length = chromosome_lengths[chromosome]
        for position in np.arange(0, length, segment_length, dtype=int):
            changepoints.append((chromosome, position))
        changepoints.append((chromosome, length))

    # gap boundaries
    for idx in gap_table.index:
        changepoints.append((gap_table.loc[idx, 'chromosome'], gap_table.loc[idx, 'start']))
        changepoints.append((gap_table.loc[idx, 'chromosome'], gap_table.loc[idx, 'end']))

    # breakends
    if breakpoint_filename is not None:
        breakpoints = pd.read_csv(
            breakpoint_filename, sep='\t',
            converters={'chromosome_1': str, 'chromosome_2': str,
                        'position_1': int, 'position_2': int})
        _check_chr_prefix(breakpoints['chromosome_1'], chr_name_prefix)
        _check_chr_prefix(breakpoints['chromosome_2'], chr_name_prefix)

        for _, row in breakpoints.iterrows():
            changepoints.append((row['chromosome_1'], row['position_1']))
            changepoints.append((row['chromosome_2'], row['position_2']))

    changepoints = pd.DataFrame(changepoints, columns=['chromosome', 'position'])
    changepoints.sort_values(['chromosome', 'position'], inplace=True)

    # segments between successive changepoints
    segments = []
    for chromosome, chrom_changepoints in changepoints.groupby('chromosome'):
        chrom_segments = pd.DataFrame({
            'start': chrom_changepoints['position'].values[:-1],
            'end': chrom_changepoints['position'].values[1:],
        })
        chrom_segments['chromosome'] = chromosome
        segments.append(chrom_segments)
    segments = pd.concat(segments, ignore_index=True)

    # drop segments inside gaps
    segments['gap'] = False
    for idx in gap_table.index:
        segments.loc[
            (segments['chromosome'] == gap_table.loc[idx, 'chromosome']) &
            (segments['start'] >= gap_table.loc[idx, 'start']) &
            (segments['start'] < gap_table.loc[idx, 'end']),
            'gap'
        ] = True
    segments = segments[~segments['gap']]

    # drop zero-length segments
    segments = segments[segments['start'] < segments['end']]

    # order by chromosome list placement then position
    segments = segments.merge(pd.DataFrame(
        list(enumerate(chromosomes)), columns=['chromosome_idx', 'chromosome']))
    segments.sort_values(['chromosome_idx', 'start'], inplace=True)

    segments.to_csv(segment_filename, sep='\t', index=False,
                    columns=['chromosome', 'start', 'end'])


def _check_chr_prefix(series, chr_name_prefix):
    if chr_name_prefix == 'chr':
        assert series.str.startswith('chr').all()
    elif chr_name_prefix == '':
        assert not series.str.startswith('chr').any()
    else:
        raise ValueError(f'unrecognized chr_name_prefix {chr_name_prefix}')


def count_segment_reads(seqdata_filename, chromosome, segments,
                        filter_duplicates=False, map_qual_threshold=1):
    """Count fragments fully contained in each segment of one chromosome
    (segment.py:124-166)."""
    reads = remixt_tpu.seqdataio.read_fragment_data(
        seqdata_filename, chromosome,
        filter_duplicates=filter_duplicates,
        map_qual_threshold=map_qual_threshold)

    reads = reads.sort_values('start')
    segments = segments.sort_values('start')

    segments['readcount'] = remixt_tpu.segalg.contained_counts(
        segments[['start', 'end']].values,
        reads[['start', 'end']].values)

    return segments.sort_index()


def create_segment_counts(segments, seqdata_filename, filter_duplicates=False,
                          map_qual_threshold=1):
    """Per-chromosome fragment counting fanned over the segment table
    (segment.py:169-205)."""
    counts = []
    for chrom, segs in segments.groupby('chromosome'):
        counts.append(count_segment_reads(
            seqdata_filename, chrom, segs.copy(),
            filter_duplicates=filter_duplicates,
            map_qual_threshold=map_qual_threshold))
    counts = pd.concat(counts)
    return counts.sort_index()


def create_segment_allele_counts(segment_data, allele_data):
    """Merge haplotype-block phased allele counts into segment counts,
    deriving major/minor columns (segment.py:208-253)."""
    allele_data = (
        allele_data
        .set_index(['chromosome', 'start', 'end', 'hap_label', 'is_allele_a'])['readcount']
        .unstack(fill_value=0)
        .reindex(columns=[0, 1])
        .fillna(0.0)
        .astype(int)
        .rename(columns={0: 'allele_b_readcount', 1: 'allele_a_readcount'})
    )

    allele_data = allele_data.groupby(level=[0, 1, 2])[
        ['allele_a_readcount', 'allele_b_readcount']].sum()

    allele_data = allele_data.reindex(
        segment_data.set_index(['chromosome', 'start', 'end']).index, fill_value=0)

    allele_data['major_readcount'] = allele_data[
        ['allele_a_readcount', 'allele_b_readcount']].max(axis=1)
    allele_data['minor_readcount'] = allele_data[
        ['allele_a_readcount', 'allele_b_readcount']].min(axis=1)
    allele_data['major_is_allele_a'] = (
        (allele_data['major_readcount'] == allele_data['allele_a_readcount']) * 1)

    segment_data = segment_data.merge(
        allele_data, left_on=['chromosome', 'start', 'end'], right_index=True)

    return segment_data
