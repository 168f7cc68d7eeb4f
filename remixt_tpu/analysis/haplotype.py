"""Haplotype inference: SNP genotyping, phasing via shapeit, haplotype-block
allele counting and cross-sample phasing.

Mirrors /root/reference/remixt/analysis/haplotype.py:14-874. Phasing shells
out to shapeit4 (GRCh38) or shapeit2 (GRCh37) plus bcftools/tabix/
bingraphsample exactly as the reference does; BCF parsing uses pysam when
available and falls back to ``bcftools view`` text output otherwise.
"""

import os
import subprocess

import numpy as np
import pandas as pd
import scipy.stats

import remixt_tpu.config
import remixt_tpu.segalg
import remixt_tpu.seqdataio


def _execute(*args):
    subprocess.check_call([str(a) for a in args if str(a) != ''])


def infer_snp_genotype(data, base_call_error=0.005, call_threshold=0.9):
    """Binomial-posterior genotype calls; adds AA/AB/BB indicator columns
    in place (haplotype.py:14-44)."""
    ref = data['ref_count'].values
    alt = data['alt_count'].values
    total = ref + alt
    data['total_count'] = total

    # per-genotype binomial likelihoods of the observed allele split
    likelihoods = {
        'AA': scipy.stats.binom.pmf(alt, total, base_call_error),
        'AB': scipy.stats.binom.pmf(alt, total, 0.5),
        'BB': scipy.stats.binom.pmf(ref, total, base_call_error),
    }
    evidence = np.add.reduce(list(likelihoods.values()))
    data['evidence'] = evidence
    for genotype, likelihood in likelihoods.items():
        posterior = likelihood / evidence
        data['likelihood_' + genotype] = likelihood
        data['posterior_' + genotype] = posterior
        data[genotype] = (posterior >= call_threshold).astype(int)


def read_snp_counts(seqdata_filename, chromosome, num_rows=1000000):
    """Ref/alt read counts per SNP (haplotype.py:47-95)."""
    chunks = []
    for alleles_chunk in remixt_tpu.seqdataio.read_allele_data(
            seqdata_filename, chromosome, chunksize=num_rows):
        if len(alleles_chunk.index) == 0:
            chunks.append(pd.DataFrame(
                columns=['position', 'ref_count', 'alt_count'], dtype=int))
            continue
        chunks.append(
            alleles_chunk
            .pivot_table(index='position', columns='is_alt',
                         aggfunc='size', fill_value=0)
            .reindex(columns=[0, 1], fill_value=0)
            .rename(columns={0: 'ref_count', 1: 'alt_count'})
            .reset_index()
        )

    snp_counts = pd.concat(chunks, ignore_index=True)

    if len(snp_counts.index) == 0:
        return pd.DataFrame(columns=['position', 'ref_count', 'alt_count']).astype(int)

    snp_counts = snp_counts.groupby('position').sum().reset_index()
    return snp_counts.sort_values('position')


def infer_snp_genotype_from_normal(snp_genotype_filename, seqdata_filename,
                                   chromosome, config):
    """SNP genotypes from the normal sample (haplotype.py:98-123)."""
    sequencing_base_call_error = remixt_tpu.config.get_param(
        config, 'sequencing_base_call_error')
    het_snp_call_threshold = remixt_tpu.config.get_param(
        config, 'het_snp_call_threshold')

    snp_counts_df = read_snp_counts(seqdata_filename, chromosome)
    infer_snp_genotype(snp_counts_df, sequencing_base_call_error,
                       het_snp_call_threshold)

    snp_counts_df.to_csv(snp_genotype_filename, sep='\t',
                         columns=['position', 'AA', 'AB', 'BB'], index=False)


def infer_snp_genotype_from_tumour(snp_genotype_filename, seqdata_filenames,
                                   chromosome, config):
    """SNP genotypes pooled across tumour samples via one-sided binomial
    tests (haplotype.py:126-176)."""
    sequencing_base_call_error = remixt_tpu.config.get_param(
        config, 'sequencing_base_call_error')
    homozygous_p_value_threshold = remixt_tpu.config.get_param(
        config, 'homozygous_p_value_threshold')

    snp_counts_df = pd.DataFrame(
        columns=['position', 'ref_count', 'alt_count']).astype(int)
    for tumour_id, seqdata_filename in seqdata_filenames.items():
        snp_counts_df = pd.concat(
            [snp_counts_df, read_snp_counts(seqdata_filename, chromosome)],
            ignore_index=True)
        snp_counts_df = snp_counts_df.groupby('position').sum().reset_index()

    snp_counts_df['total_count'] = (snp_counts_df['alt_count']
                                    + snp_counts_df['ref_count'])
    snp_counts_df = snp_counts_df[snp_counts_df['total_count'] > 50]

    def binom_test_greater(k, n):
        return scipy.stats.binomtest(
            int(k), int(n), p=sequencing_base_call_error,
            alternative='greater').pvalue

    snp_counts_df['prob_no_A'] = [
        binom_test_greater(k, n) for k, n in
        zip(snp_counts_df['ref_count'], snp_counts_df['total_count'])]
    snp_counts_df['prob_no_B'] = [
        binom_test_greater(k, n) for k, n in
        zip(snp_counts_df['alt_count'], snp_counts_df['total_count'])]

    snp_counts_df['has_A'] = snp_counts_df['prob_no_A'] < homozygous_p_value_threshold
    snp_counts_df['has_B'] = snp_counts_df['prob_no_B'] < homozygous_p_value_threshold

    snp_counts_df['AA'] = (snp_counts_df['has_A'] & ~snp_counts_df['has_B']) * 1
    snp_counts_df['BB'] = (snp_counts_df['has_B'] & ~snp_counts_df['has_A']) * 1
    snp_counts_df['AB'] = (snp_counts_df['has_A'] & snp_counts_df['has_B']) * 1

    snp_counts_df.to_csv(snp_genotype_filename, sep='\t',
                         columns=['position', 'AA', 'AB', 'BB'], index=False)


def read_bcf_phased_genotypes(bcf_filename):
    """Phased alleles from a shapeit4 BCF (haplotype.py:179-213), parsed
    from ``bcftools view`` output (pysam/htslib are not dependencies)."""
    phased_genotypes = []

    out = subprocess.run(
        ['bcftools', 'view', '-H', bcf_filename],
        capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        fields = line.split('\t')
        chromosome, position, _, ref, alts = fields[0], int(fields[1]), fields[2], fields[3], fields[4]
        gt = fields[9].split(':')[0].replace('/', '|')
        allele1, allele2 = (int(a) for a in gt.split('|'))
        for alt in alts.split(','):
            phased_genotypes.append(
                [chromosome, position, ref, alt, allele1, allele2])

    return pd.DataFrame(
        phased_genotypes,
        columns=['chromosome', 'position', 'ref', 'alt', 'allele1', 'allele2'])


def read_phasing_samples(bcf_filenames):
    """Yield phasing samples indexed by (chrom, pos, ref, alt)
    (haplotype.py:216-232)."""
    for bcf_filename in bcf_filenames:
        phasing = read_bcf_phased_genotypes(bcf_filename)
        phasing.set_index(['chromosome', 'position', 'ref', 'alt'], inplace=True)
        yield phasing


def calculate_haplotypes(phasing_samples, changepoint_threshold=0.95):
    """Changepoint-confidence haplotype blocks from sampled phasings
    (haplotype.py:235-292)."""
    haplotypes = None
    n_samples = 0

    for phasing in phasing_samples:
        phasing = phasing[phasing['allele1'] != phasing['allele2']]
        changepoints = phasing['allele1'].diff().abs().astype(float).fillna(0.0)
        if haplotypes is None:
            haplotypes = changepoints
        else:
            haplotypes += changepoints
        n_samples += 1

    haplotypes /= float(n_samples)

    haplotypes = haplotypes.rename('fraction_changepoint').reset_index()

    haplotypes['changepoint_confidence'] = np.maximum(
        haplotypes['fraction_changepoint'],
        1.0 - haplotypes['fraction_changepoint'])
    haplotypes['is_changepoint'] = haplotypes['fraction_changepoint'].round().astype(int)
    haplotypes['not_confident'] = (
        haplotypes['changepoint_confidence'] < float(changepoint_threshold))
    haplotypes['chrom_different'] = haplotypes['chromosome'].ne(
        haplotypes['chromosome'].shift())
    haplotypes['hap_label'] = (
        haplotypes['not_confident'] | haplotypes['chrom_different']).cumsum() - 1
    haplotypes['allele1'] = haplotypes['is_changepoint'].cumsum().mod(2)
    haplotypes['allele2'] = 1 - haplotypes['allele1']

    return haplotypes


def _write_null_haps(haps_filename):
    with open(haps_filename, 'w') as haps_file:
        haps_file.write('chromosome\tposition\tallele\thap_label\tallele_id\n')


def infer_haps_grch38_shapeit4(haps_filename, snp_genotype_filename, chromosome,
                               temp_directory, config, ref_data_dir):
    """GRCh38 phasing via shapeit4 + bingraphsample (haplotype.py:295-472)."""
    chr_name_prefix = remixt_tpu.config.get_param(config, 'chr_name_prefix')
    if chr_name_prefix == '':
        grch38_1kg_chromosome = 'chr' + chromosome
    elif chr_name_prefix == 'chr':
        grch38_1kg_chromosome = chromosome
    else:
        # a typo'd prefix would otherwise silently phase against the wrong
        # 1kg region (reference haplotype.py:365-371 raises likewise)
        raise ValueError(
            'unrecognized chr_name_prefix {!r}'.format(chr_name_prefix))

    if str(grch38_1kg_chromosome) not in remixt_tpu.config.get_param(
            config, 'grch38_1kg_chromosomes'):
        _write_null_haps(haps_filename)
        return

    # male X has no het snps
    if (chromosome == remixt_tpu.config.get_param(config, 'grch38_1kg_phased_chromosome_x')
            and not remixt_tpu.config.get_param(config, 'is_female')):
        _write_null_haps(haps_filename)
        return

    os.makedirs(temp_directory, exist_ok=True)

    snp_positions_filename = remixt_tpu.config.get_filename(
        config, ref_data_dir, 'snp_positions')

    snp_positions_dfs = []
    for chunk in pd.read_csv(
            snp_positions_filename, sep='\t',
            names=['chromosome', 'position', 'ref', 'alt'],
            dtype={'chromosome': str}, chunksize=int(1e6)):
        snp_positions_dfs.append(chunk[chunk['chromosome'] == chromosome])
    snp_positions = pd.concat(snp_positions_dfs)

    snp_genotypes = pd.read_csv(snp_genotype_filename, sep='\t')
    snp_genotypes['chromosome'] = chromosome
    snp_genotypes = snp_genotypes.merge(snp_positions)

    if snp_genotypes.empty:
        raise ValueError('no snps to phase')

    snp_genotypes = snp_genotypes[
        (snp_genotypes['AB'] == 1) & (snp_genotypes['AA'] == 0)
        & (snp_genotypes['BB'] == 0)]
    snp_genotypes['chromosome'] = grch38_1kg_chromosome

    # het SNP VCF for shapeit4
    snp_genotypes['ID'] = (snp_genotypes['chromosome'] + '_'
                           + snp_genotypes['position'].astype(str) + '_'
                           + snp_genotypes['ref'] + '_' + snp_genotypes['alt'])
    snp_genotypes['QUAL'] = '.'
    snp_genotypes['FILTER'] = '.'
    snp_genotypes['INFO'] = '.'
    snp_genotypes['FORMAT'] = 'GT'
    snp_genotypes['NORMAL'] = '0/1'
    snp_genotypes = snp_genotypes.rename(columns={
        'chromosome': '#CHROM', 'position': 'POS', 'ref': 'REF', 'alt': 'ALT'})
    cols = ['#CHROM', 'POS', 'ID', 'REF', 'ALT', 'QUAL', 'FILTER', 'INFO',
            'FORMAT', 'NORMAL']

    temp_vcf_filename = os.path.join(temp_directory, 'het_snps.vcf')
    for suffix in ['', '.gz', '.gz.tbi']:
        try:
            os.remove(temp_vcf_filename + suffix)
        except OSError:
            pass

    with open(temp_vcf_filename, 'w') as f:
        f.write('##fileformat=VCFv4.2\n')
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        snp_genotypes[cols].to_csv(f, sep='\t', index=False)

    temp_bcf_filename = os.path.join(temp_directory, 'het_snps.bcf')

    _execute('bgzip', '--force', temp_vcf_filename)
    _execute('tabix', temp_vcf_filename + '.gz')
    _execute('bcftools', 'view', '-O', 'b', temp_vcf_filename + '.gz',
             '-o', temp_bcf_filename)
    _execute('bcftools', 'index', temp_bcf_filename)

    if grch38_1kg_chromosome == remixt_tpu.config.get_param(
            config, 'grch38_1kg_phased_chromosome_x'):
        bcf_reference_filename = remixt_tpu.config.get_filename(
            config, ref_data_dir, 'grch38_1kg_X_bcf_filename')
    else:
        bcf_reference_filename = remixt_tpu.config.get_filename(
            config, ref_data_dir, 'grch38_1kg_bcf_filename',
            chromosome=grch38_1kg_chromosome)

    genetic_map_filename = remixt_tpu.config.get_filename(
        config, ref_data_dir, 'genetic_map_grch38_filename',
        chromosome=grch38_1kg_chromosome)

    bingraph_filename = os.path.join(temp_directory, 'phasing.bingraph')
    _execute('shapeit4',
             '--input', temp_bcf_filename,
             '--map', genetic_map_filename,
             '--region', grch38_1kg_chromosome,
             '--reference', bcf_reference_filename,
             '--bingraph', bingraph_filename)

    sample_template = os.path.join(temp_directory, 'sampled.{0}.bcf')
    shapeit_num_samples = remixt_tpu.config.get_param(config, 'shapeit_num_samples')
    sample_filenames = []
    for s in range(shapeit_num_samples):
        sample_filename = sample_template.format(s)
        sample_filenames.append(sample_filename)
        _execute('bingraphsample',
                 '--input', bingraph_filename,
                 '--output', sample_filename,
                 '--sample',
                 '--seed', str(s))
        _execute('bcftools', 'index', '-f', sample_filename)

    shapeit_confidence_threshold = remixt_tpu.config.get_param(
        config, 'shapeit_confidence_threshold')

    haplotypes = calculate_haplotypes(
        read_phasing_samples(sample_filenames),
        changepoint_threshold=shapeit_confidence_threshold)

    haplotypes = pd.concat([
        haplotypes.rename(columns={'allele1': 'allele'})[
            ['chromosome', 'position', 'allele', 'hap_label']].assign(allele_id=0),
        haplotypes.rename(columns={'allele2': 'allele'})[
            ['chromosome', 'position', 'allele', 'hap_label']].assign(allele_id=1),
    ])

    if chr_name_prefix == '':
        if not haplotypes['chromosome'].str.startswith('chr').all():
            raise ValueError('unexpected chromosome prefix')
        haplotypes['chromosome'] = haplotypes['chromosome'].str.slice(start=3)

    haplotypes[['chromosome', 'position', 'allele', 'hap_label', 'allele_id']] \
        .to_csv(haps_filename, sep='\t', index=False)


def infer_haps_grch37_shapeit2(haps_filename, snp_genotype_filename, chromosome,
                               temp_directory, config, ref_data_dir):
    """GRCh37 phasing via shapeit2 with haplotype-graph sampling
    (haplotype.py:475-640)."""
    accepted_chromosomes = [str(a) for a in range(1, 23)] + ['X']
    if str(chromosome) not in accepted_chromosomes:
        _write_null_haps(haps_filename)
        return

    os.makedirs(temp_directory, exist_ok=True)

    if chromosome == 'X' and not remixt_tpu.config.get_param(config, 'is_female'):
        _write_null_haps(haps_filename)
        return

    phased_chromosome = chromosome
    if chromosome == 'X':
        phased_chromosome = remixt_tpu.config.get_param(config, 'phased_chromosome_x')
    genetic_map_filename = remixt_tpu.config.get_filename(
        config, ref_data_dir, 'genetic_map', chromosome=phased_chromosome)
    hap_filename = remixt_tpu.config.get_filename(
        config, ref_data_dir, 'haplotypes', chromosome=phased_chromosome)
    legend_filename = remixt_tpu.config.get_filename(
        config, ref_data_dir, 'legend', chromosome=phased_chromosome)

    snp_genotype_df = pd.read_csv(snp_genotype_filename, sep='\t')

    if len(snp_genotype_df) == 0:
        _write_null_haps(haps_filename)
        return

    snp_genotype_df = snp_genotype_df[
        (snp_genotype_df['AA'] == 1) | (snp_genotype_df['AB'] == 1)
        | (snp_genotype_df['BB'] == 1)]

    snps_df = pd.read_csv(legend_filename, compression='gzip', sep=' ',
                          usecols=['position', 'a0', 'a1'])
    snps_df = snps_df[(snps_df['a0'].isin(['A', 'C', 'T', 'G']))
                      & (snps_df['a1'].isin(['A', 'C', 'T', 'G']))]
    snps_df = snps_df.merge(snp_genotype_df[['position', 'AA', 'AB', 'BB']],
                            on='position', how='inner', sort=False)

    snps_df['chr'] = chromosome
    snps_df['chr_pos'] = snps_df['chr'].astype(str) + ':' + snps_df['position'].astype(str)

    temp_gen_filename = os.path.join(temp_directory, 'snps.gen')
    snps_df.to_csv(temp_gen_filename, sep=' ',
                   columns=['chr', 'chr_pos', 'position', 'a0', 'a1', 'AA', 'AB', 'BB'],
                   index=False, header=False)

    temp_sample_filename = os.path.join(temp_directory, 'snps.sample')
    with open(temp_sample_filename, 'w') as temp_sample_file:
        temp_sample_file.write('ID_1 ID_2 missing sex\n0 0 0 0\nUNR1 UNR1 0 2\n')

    hgraph_filename = os.path.join(temp_directory, 'phased.hgraph')
    hgraph_logs_prefix = hgraph_filename + '.log'
    chr_x_flag = '--chrX' if chromosome == 'X' else ''
    sample_filename = remixt_tpu.config.get_filename(config, ref_data_dir, 'sample')
    _execute('shapeit', '-M', genetic_map_filename,
             '-R', hap_filename, legend_filename, sample_filename,
             '-G', temp_gen_filename, temp_sample_filename,
             '--output-graph', hgraph_filename, chr_x_flag,
             '--no-mcmc', '-L', hgraph_logs_prefix, '--seed', '12345')

    sample_template = os.path.join(temp_directory, 'sampled.{0}')
    averaged_changepoints = None
    shapeit_num_samples = remixt_tpu.config.get_param(config, 'shapeit_num_samples')
    sample_haps = None
    for s in range(shapeit_num_samples):
        sample_prefix = sample_template.format(s)
        sample_log_filename = sample_prefix + '.log'
        sample_haps_filename = sample_prefix + '.haps'
        sample_sample_filename = sample_prefix + '.sample'

        # shapeit sampling sometimes segfaults; retry 3 times
        # (haplotype.py:576-589)
        success = False
        for _ in range(3):
            try:
                _execute('shapeit', '-convert', '--input-graph', hgraph_filename,
                         '--output-sample', sample_prefix,
                         '--seed', str(s), '-L', sample_log_filename)
                success = True
                break
            except subprocess.CalledProcessError:
                print(f'failed sampling with seed {s}, retrying')
                continue
        if not success:
            raise Exception(f'failed to sample three times with seed {s}')

        sample_haps = pd.read_csv(
            sample_haps_filename, sep=' ', header=None,
            names=['id', 'id2', 'position', 'ref', 'alt', 'allele1', 'allele2'],
            usecols=['position', 'allele1', 'allele2'])
        sample_haps = sample_haps[sample_haps['allele1'] != sample_haps['allele2']]
        sample_haps['allele'] = sample_haps['allele1']
        sample_haps = sample_haps.drop(['allele1', 'allele2'], axis=1)
        sample_haps.set_index('position', inplace=True)
        sample_changepoints = sample_haps['allele'].diff().abs().astype(float).fillna(0.0)
        if averaged_changepoints is None:
            averaged_changepoints = sample_changepoints
        else:
            averaged_changepoints += sample_changepoints
        os.remove(sample_log_filename)
        os.remove(sample_haps_filename)
        os.remove(sample_sample_filename)
    averaged_changepoints /= float(shapeit_num_samples)
    last_sample_haps = sample_haps

    changepoint_confidence = np.maximum(averaged_changepoints,
                                        1.0 - averaged_changepoints)

    current_hap_label = 0
    hap_label = []
    shapeit_confidence_threshold = remixt_tpu.config.get_param(
        config, 'shapeit_confidence_threshold')
    for x in changepoint_confidence:
        if x < float(shapeit_confidence_threshold):
            current_hap_label += 1
        hap_label.append(current_hap_label)

    haps = last_sample_haps
    haps['changepoint_confidence'] = changepoint_confidence
    haps['hap_label'] = hap_label
    haps.reset_index(inplace=True)
    haps['allele_id'] = 0

    haps_allele2 = haps.copy()
    haps_allele2['allele_id'] = 1
    haps_allele2['allele'] = 1 - haps_allele2['allele']

    haps = pd.concat([haps, haps_allele2], ignore_index=True)
    haps.sort_values(['position', 'allele_id'], inplace=True)
    haps['chromosome'] = chromosome
    haps = haps[['chromosome', 'position', 'allele', 'hap_label', 'allele_id']]

    haps.to_csv(haps_filename, sep='\t', index=False)


def infer_haps(haps_filename, snp_genotype_filename, chromosome, temp_directory,
               config, ref_data_dir):
    """Dispatch to the genome-version-appropriate phasing tool
    (haplotype.py:643-650)."""
    ensembl_genome_version = remixt_tpu.config.get_param(config, 'ensembl_genome_version')
    if ensembl_genome_version == 'GRCh38':
        infer_haps_grch38_shapeit4(haps_filename, snp_genotype_filename,
                                   chromosome, temp_directory, config, ref_data_dir)
    elif ensembl_genome_version == 'GRCh37':
        infer_haps_grch37_shapeit2(haps_filename, snp_genotype_filename,
                                   chromosome, temp_directory, config, ref_data_dir)
    else:
        raise ValueError(f'unsupported genome version {ensembl_genome_version}')


def count_allele_reads(seqdata_filename, haps, chromosome, segments,
                       filter_duplicates=False, map_qual_threshold=1):
    """Reads per haplotype-block allele per segment (haplotype.py:653-746)."""
    haps = haps[haps['chromosome'] == chromosome]

    alleles = []
    for alleles_chunk in remixt_tpu.seqdataio.read_allele_data(
            seqdata_filename, chromosome, chunksize=1000000):
        alleles_chunk = alleles_chunk.merge(
            haps, left_on=['position', 'is_alt'],
            right_on=['position', 'allele'], how='inner')
        alleles.append(alleles_chunk)
    alleles = pd.concat(alleles, ignore_index=True)

    reads = remixt_tpu.seqdataio.read_fragment_data(
        seqdata_filename, chromosome,
        filter_duplicates=filter_duplicates,
        map_qual_threshold=map_qual_threshold)

    # merging read start/end also drops filtered reads from the allele table
    alleles = alleles.merge(reads, on='fragment_id')

    # arbitrarily assign one haplotype/allele label per read
    alleles.drop_duplicates('fragment_id', inplace=True)

    segments = segments.sort_values('start').reset_index(drop=True)

    alleles['segment_idx'] = remixt_tpu.segalg.find_contained_segments(
        segments[['start', 'end']].values,
        alleles[['start', 'end']].values)

    alleles = alleles[alleles['segment_idx'] >= 0]
    alleles = alleles.drop(['start', 'end'], axis=1)
    alleles = alleles.merge(segments[['start', 'end']],
                            left_on='segment_idx', right_index=True)

    if len(alleles.index) == 0:
        return pd.DataFrame(columns=[
            'chromosome', 'start', 'end', 'hap_label', 'allele_id', 'readcount'])

    allele_counts = (
        alleles
        .set_index(['start', 'end', 'hap_label', 'allele_id'])
        .groupby(level=[0, 1, 2, 3])
        .size()
        .reset_index()
        .rename(columns={0: 'readcount'})
    )
    allele_counts['chromosome'] = chromosome

    return allele_counts


def create_allele_counts(segments, seqdata_filename, haps_filename,
                         filter_duplicates=False, map_qual_threshold=1):
    """Allele counts fanned over chromosomes (haplotype.py:749-789)."""
    haps = pd.read_csv(haps_filename, sep='\t', converters={'chromosome': str})

    counts = []
    for chrom, segs in segments.groupby('chromosome'):
        counts.append(count_allele_reads(
            seqdata_filename, haps, chrom, segs.copy(),
            filter_duplicates=filter_duplicates,
            map_qual_threshold=map_qual_threshold))
    return pd.concat(counts, ignore_index=True)


def phase_segments(*allele_counts_tables):
    """Assign allele a/b consistently across samples: per segment, trust the
    sample with the largest major/minor difference (haplotype.py:792-874)."""
    allele_phases = []
    allele_diffs = []

    for idx, allele_data in enumerate(allele_counts_tables):
        allele_data = allele_data.set_index(
            ['chromosome', 'start', 'end', 'hap_label', 'allele_id'])['readcount'] \
            .astype(float).unstack(fill_value=0.0)

        allele_phase = allele_data.idxmax(axis=1)
        allele_phase.name = 'major_allele_id'
        allele_phase = allele_phase.reset_index().reindex(
            columns=['chromosome', 'start', 'end', 'hap_label', 'major_allele_id'])
        allele_phase['library_idx'] = idx
        allele_phases.append(allele_phase)

        allele_data['major_readcount'] = allele_data.max(axis=1)
        allele_data['minor_readcount'] = allele_data.min(axis=1)
        allele_data['diff_readcount'] = (allele_data['major_readcount']
                                         - allele_data['minor_readcount'])
        allele_data['total_readcount'] = (allele_data['major_readcount']
                                          + allele_data['minor_readcount'])

        allele_diff = allele_data.groupby(level=[0, 1, 2])[
            ['diff_readcount', 'total_readcount']].sum()
        allele_diff['norm_diff_readcount'] = (
            allele_diff['diff_readcount'] / allele_diff['total_readcount'])
        allele_diff = allele_diff[['norm_diff_readcount']]
        allele_diff = allele_diff.reset_index()
        allele_diff['library_idx'] = idx
        allele_diffs.append(allele_diff)

    allele_phases = pd.concat(allele_phases, ignore_index=True)
    allele_diffs = pd.concat(allele_diffs, ignore_index=True)

    def select_largest_diff(df):
        largest_idx = np.argmax(df['norm_diff_readcount'].values)
        return df['library_idx'].values[largest_idx]

    segment_library = (
        allele_diffs.set_index(['chromosome', 'start', 'end'])
        .groupby(level=[0, 1, 2])
        .apply(select_largest_diff)
    )
    segment_library.name = 'library_idx'
    segment_library = segment_library.reset_index().reindex(
        columns=['chromosome', 'start', 'end', 'library_idx'])

    allele_phases = allele_phases.merge(
        segment_library,
        on=['chromosome', 'start', 'end', 'library_idx'], how='right')
    allele_phases = allele_phases[
        ['chromosome', 'start', 'end', 'hap_label', 'major_allele_id']] \
        .rename(columns={'major_allele_id': 'allele_a_id'})

    phased_allele_counts = []
    for allele_data in allele_counts_tables:
        if len(allele_data.index) == 0:
            phased_allele_counts.append(pd.DataFrame(columns=[
                'chromosome', 'start', 'end', 'hap_label', 'allele_id',
                'readcount', 'is_allele_a']))
            continue

        allele_data = allele_data.merge(
            allele_phases, on=['chromosome', 'start', 'end', 'hap_label'])
        allele_data['is_allele_a'] = (
            (allele_data['allele_id'] == allele_data['allele_a_id']) * 1)
        allele_data = allele_data[[
            'chromosome', 'start', 'end', 'hap_label', 'allele_id',
            'readcount', 'is_allele_a']]

        phased_allele_counts.append(allele_data)

    return phased_allele_counts
