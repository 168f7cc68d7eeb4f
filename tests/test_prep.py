"""Data-prep layer tests: seqdata store roundtrip, segment/allele counting,
haplotype block logic, GC curve fitting.

Patterns from reference test_seqdata.py (write/read roundtrip),
test_haplotype.py (hand-built phasing samples), test strategy SURVEY.md §4.
"""

import numpy as np
import pandas as pd
import pytest

import remixt_tpu.seqdataio as seqdataio
import remixt_tpu.analysis.segment as segment_mod
import remixt_tpu.analysis.haplotype as haplotype_mod
import remixt_tpu.analysis.stats as stats_mod
import remixt_tpu.analysis.gcbias as gcbias_mod


@pytest.fixture
def seqdata_file(tmp_path):
    rng = np.random.RandomState(0)
    n = 10000
    start = rng.randint(0, int(1e6), size=n)
    length = rng.randint(100, 400, size=n)

    fragments = pd.DataFrame({
        'fragment_id': np.arange(n),
        'start': start,
        'end': start + length,
        'mapping_quality': rng.choice([0, 10, 60], size=n),
        'is_duplicate': rng.choice([0, 1], size=n, p=[0.95, 0.05]),
    })
    alleles = pd.DataFrame({
        'fragment_id': rng.randint(0, n, size=n * 2),
        'position': rng.randint(0, int(1e6), size=n * 2),
        'is_alt': rng.randint(0, 2, size=n * 2),
    })

    path = str(tmp_path / 'seqdata.h5')
    writer = seqdataio.Writer(path)
    # write in two chunks to exercise append with index offsets
    writer.write('1', fragments.iloc[:6000], alleles.iloc[:12000])
    writer.write('1', fragments.iloc[6000:], alleles.iloc[12000:])
    writer.write('2', fragments.iloc[:100], alleles.iloc[:200])
    writer.close()
    return path, fragments, alleles


def test_seqdata_roundtrip(seqdata_file):
    path, fragments, alleles = seqdata_file

    reads = seqdataio.read_fragment_data(path, '1', filter_duplicates=None,
                                         map_qual_threshold=None, keep_cols=True)
    assert len(reads.index) == len(fragments.index)
    np.testing.assert_array_equal(reads['start'].values, fragments['start'].values)

    allele_data = seqdataio.read_allele_data(path, '1')
    assert len(allele_data.index) == len(alleles.index)

    assert seqdataio.read_chromosomes(path) == {'1', '2'}

    # filtering
    filtered = seqdataio.read_fragment_data(path, '1', filter_duplicates=True,
                                            map_qual_threshold=30)
    expected = fragments[(fragments['is_duplicate'] == 0)
                         & (fragments['mapping_quality'] >= 30)]
    assert len(filtered.index) == len(expected.index)

    # chunked reads concatenate to the full table
    chunks = list(seqdataio.read_fragment_data(path, '1', filter_duplicates=None,
                                               map_qual_threshold=None,
                                               chunksize=3000))
    assert sum(len(c.index) for c in chunks) == len(fragments.index)

    # missing chromosome yields the empty schema
    empty = seqdataio.read_fragment_data(path, 'MT')
    assert len(empty.index) == 0


def test_seqdata_merge(seqdata_file, tmp_path):
    path, fragments, alleles = seqdata_file
    merged_path = str(tmp_path / 'merged.h5')
    seqdataio.merge_overlapping_seqdata(merged_path, {'a': path, 'b': path}, ['1', '2'])
    reads = seqdataio.read_fragment_data(merged_path, '1', filter_duplicates=None,
                                         map_qual_threshold=None)
    assert len(reads.index) == 2 * len(fragments.index)
    # fragment ids must remain unique
    allele_data = seqdataio.read_allele_data(merged_path, '1')
    assert allele_data['fragment_id'].max() > alleles['fragment_id'].max()


def test_create_segments_drops_unconfigured_chromosomes(tmp_path):
    """Gap tables carry chrY/chrM/unplaced contigs; their inter-gap
    segments must not leak into the segmentation (the reference's inner
    merge drops them)."""
    import gzip

    fai = tmp_path / 'genome.fa.fai'
    fai.write_text('1\t30000\t0\t60\t61\n2\t20000\t0\t60\t61\n'
                   'Y\t10000\t0\t60\t61\n')
    gap = tmp_path / 'gaps.txt.gz'
    with gzip.open(gap, 'wt') as f:
        # bin chrom start end ix n size type bridge
        f.write('0\t1\t5000\t6000\t0\tN\t1000\ttelomere\tno\n')
        f.write('0\tY\t2000\t3000\t0\tN\t1000\ttelomere\tno\n')
    config = {
        'chromosomes': ['1', '2'],
        'segment_length': 10000,
        'chr_name_prefix': '',
        'gap_table_filename': str(gap),
        'genome_fai_filename': str(fai),
    }
    out = tmp_path / 'segments.tsv'
    segment_mod.create_segments(str(out), config, str(tmp_path))
    seg = pd.read_csv(out, sep='\t', converters={'chromosome': str})
    assert set(seg['chromosome']) == {'1', '2'}
    assert (seg['start'] < seg['end']).all()


def test_seqdata_merge_empty_allele_table(tmp_path):
    """A chromosome group with fragments but zero allele rows must not
    poison the fragment-id offsets of later files (NaN from empty .max())."""
    def build(filename, n):
        writer = seqdataio.Writer(str(filename))
        fragments = pd.DataFrame({
            'fragment_id': np.arange(n),
            'start': np.arange(n) * 10,
            'end': np.arange(n) * 10 + 5,
        })
        alleles = pd.DataFrame(
            columns=['fragment_id', 'position', 'is_alt']).astype(int)
        writer.write('1', fragments, alleles)
        writer.close()
        return str(filename)

    a = build(tmp_path / 'a.h5', 50)
    b = build(tmp_path / 'b.h5', 30)
    merged = str(tmp_path / 'empty_allele_merged.h5')
    seqdataio.merge_overlapping_seqdata(merged, {'a': a, 'b': b}, ['1'])

    reads = seqdataio.read_fragment_data(merged, '1', filter_duplicates=None,
                                         map_qual_threshold=None)
    assert len(reads.index) == 80
    ids = reads['fragment_id'].values
    assert ids.min() >= 0                      # no NaN -> int64 garbage
    assert len(np.unique(ids)) == 80           # ids stay unique


def test_segment_counting(seqdata_file):
    path, fragments, _ = seqdata_file
    segments = pd.DataFrame({
        'chromosome': ['1', '1', '1'],
        'start': [0, 300000, 600000],
        'end': [300000, 600000, 1100000],
    })
    counts = segment_mod.create_segment_counts(
        segments, path, filter_duplicates=False, map_qual_threshold=1)

    reads = fragments[(fragments['mapping_quality'] >= 1)]
    expected = [
        ((reads['start'] >= s) & (reads['end'] <= e)).sum()
        for s, e in zip(segments['start'], segments['end'])
    ]
    np.testing.assert_array_equal(counts['readcount'].values, expected)


def test_fragment_stats(seqdata_file):
    path, fragments, _ = seqdata_file
    stats = stats_mod.calculate_fragment_stats(path, {})
    lengths = []
    for chrom, frac in [('1', 1.0), ('2', 1.0)]:
        reads = seqdataio.read_fragment_data(path, chrom, filter_duplicates=False,
                                             map_qual_threshold=1)
        lengths.append(reads['end'].values - reads['start'].values)
    lengths = np.concatenate(lengths)
    np.testing.assert_allclose(stats.fragment_mean, lengths.mean(), rtol=1e-6)
    np.testing.assert_allclose(stats.fragment_stddev, lengths.std(), rtol=1e-6)


def test_calculate_haplotypes():
    """Hand-built phasing samples (pattern of reference test_haplotype.py:11-34)."""
    positions = [100, 200, 300, 400, 500]
    idx = pd.MultiIndex.from_tuples(
        [('1', p, 'A', 'T') for p in positions],
        names=['chromosome', 'position', 'ref', 'alt'])

    def sample(alleles):
        return pd.DataFrame(
            {'allele1': alleles, 'allele2': [1 - a for a in alleles]}, index=idx)

    # all samples agree: changepoint between position 200 and 300
    samples = [sample([0, 0, 1, 1, 1]) for _ in range(10)]
    haps = haplotype_mod.calculate_haplotypes(iter(samples), changepoint_threshold=0.95)

    assert list(haps['hap_label'].unique()) == [0]
    np.testing.assert_array_equal(haps['allele1'].values, [0, 0, 1, 1, 1])

    # disagreement at the changepoint splits the block
    samples = [sample([0, 0, 1, 1, 1]) for _ in range(5)] \
        + [sample([0, 0, 0, 0, 0]) for _ in range(5)]
    haps = haplotype_mod.calculate_haplotypes(iter(samples), changepoint_threshold=0.95)
    assert haps['hap_label'].nunique() == 2


def test_infer_haps_rejects_bad_chr_prefix(tmp_path):
    """A typo'd chr_name_prefix must raise, not silently phase against the
    wrong 1kg region (reference haplotype.py:365-371)."""
    with pytest.raises(ValueError, match='chr_name_prefix'):
        haplotype_mod.infer_haps_grch38_shapeit4(
            str(tmp_path / 'haps.tsv'), str(tmp_path / 'genotype.tsv'),
            '1', str(tmp_path / 'tmp'), {'chr_name_prefix': 'Chr'},
            str(tmp_path))


def test_infer_snp_genotype():
    data = pd.DataFrame({
        'ref_count': [30, 15, 0, 5],
        'alt_count': [0, 15, 30, 5],
    })
    haplotype_mod.infer_snp_genotype(data, base_call_error=0.005, call_threshold=0.9)
    np.testing.assert_array_equal(data['AA'].values, [1, 0, 0, 0])
    np.testing.assert_array_equal(data['AB'].values, [0, 1, 0, 1])
    np.testing.assert_array_equal(data['BB'].values, [0, 0, 1, 0])


def test_phase_segments():
    def make_counts(major_counts, minor_counts):
        rows = []
        for i, (ma, mi) in enumerate(zip(major_counts, minor_counts)):
            rows.append(('1', 0, 1000, i, 0, ma))
            rows.append(('1', 0, 1000, i, 1, mi))
        return pd.DataFrame(rows, columns=[
            'chromosome', 'start', 'end', 'hap_label', 'allele_id', 'readcount'])

    # library 0 has the stronger allelic imbalance and defines allele a
    t0 = make_counts([100, 90, 80], [10, 20, 15])
    t1 = make_counts([40, 45, 42], [38, 40, 41])

    phased = haplotype_mod.phase_segments(t0, t1)
    assert len(phased) == 2
    for tab in phased:
        assert 'is_allele_a' in tab.columns
    # allele 0 (major in library 0) should be allele a everywhere
    tab0 = phased[0]
    a_calls = tab0[tab0['allele_id'] == 0]['is_allele_a']
    assert (a_calls == 1).all()


def test_lowess_smoke():
    rng = np.random.RandomState(0)
    x = np.arange(101, dtype=float)
    y = np.exp(-(x - 50) ** 2 / 400) + rng.normal(0, 0.02, size=101)
    sm = gcbias_mod.lowess(y, x, frac=0.2)
    assert np.all(np.isfinite(sm))
    # smooth curve should reduce residual variance vs the noisy input
    assert np.std(np.diff(sm)) < np.std(np.diff(y))
    # peak position roughly preserved
    assert abs(int(np.argmax(sm)) - 50) <= 3


def test_gc_lowess_task(tmp_path):
    rng = np.random.RandomState(1)
    n = 5000
    gc = rng.uniform(0.2, 0.8, size=n)
    count = rng.poisson(5 * np.exp(-(gc - 0.45) ** 2 / 0.02))
    samples = pd.DataFrame({
        'chromosome': ['1'] * n,
        'position': np.arange(n),
        'gc': gc,
        'count': count,
    })
    samples_file = str(tmp_path / 'gc_samples.tsv')
    samples.to_csv(samples_file, sep='\t', header=False, index=False)

    dist_file = str(tmp_path / 'gc_dist.tsv')
    table_file = str(tmp_path / 'gc_table.tsv')
    gcbias_mod.gc_lowess(samples_file, dist_file, table_file)

    curve = np.loadtxt(dist_file)
    assert curve.shape[0] == 101
    assert np.nanmax(curve) <= 1.0 + 1e-9
    # curve should peak near gc=0.45
    assert abs(int(np.argmax(curve)) - 45) <= 10
