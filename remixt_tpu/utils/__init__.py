"""Host-side utilities: weighted sampling, FASTA/FAI io, table sharding,
fuzzy breakpoint matching, idempotent-step sentinels.

API parity with /root/reference/remixt/utils.py:13-212; implementations are
original (numpy searchsorted based matching, subprocess-based downloads).
"""

import bisect
import collections
import csv
import os
import shutil
import subprocess

import numpy as np
import pandas as pd


class TempRandomSeed:
    """Temporarily seed numpy's global RNG, restoring state on clean exit.

    Mirrors reference utils.py:13-21 (used to make weighted resampling
    deterministic without perturbing the caller's RNG stream).
    """

    def __init__(self, seed=1234):
        self.seed = seed

    def __enter__(self):
        self.rng_state = np.random.get_state()
        np.random.seed(self.seed)
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        if exc_type is None:
            np.random.set_state(self.rng_state)


def weighted_resample(data, weights, num_samples=10000):
    """Resample `data` with multinomial counts proportional to `weights`.

    Reference: utils.py:24-29.
    """
    norm_weights = np.asarray(weights, dtype=float) / float(np.sum(weights))
    with TempRandomSeed():
        counts = np.random.multinomial(num_samples, norm_weights)
    return np.repeat(data, counts)


def weighted_percentile(data, weights, percentile, num_samples=10000):
    """Percentile of a weighted-resampled dataset. Reference: utils.py:32-34."""
    samples = weighted_resample(data, weights, num_samples=num_samples)
    return np.percentile(samples, percentile)


def read_sequences(fasta_filename):
    """Yield (seq_id, sequence) pairs from a FASTA file. Reference: utils.py:37-53."""
    seq_id = None
    chunks = []
    with open(fasta_filename, 'rt') as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith('>'):
                if seq_id is not None:
                    yield seq_id, ''.join(chunks)
                seq_id = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if seq_id is not None:
        yield seq_id, ''.join(chunks)


def write_sequence(fasta, seq_id, sequence, width=80):
    """Write one FASTA record wrapped at `width` columns. Reference: utils.py:56-65."""
    fasta.write('>{}\n'.format(seq_id))
    for idx in range(0, len(sequence), width):
        line_seq = sequence[idx:idx + width]
        if line_seq:
            fasta.write(line_seq)
            fasta.write('\n')


_COMPLEMENT = str.maketrans('ACTGactg', 'TGACtgac')


def reverse_complement(sequence):
    """Reverse complement of a DNA sequence. Reference: utils.py:68-69."""
    return sequence[::-1].translate(_COMPLEMENT)


def read_chromosome_lengths(genome_fai_filename):
    """Chromosome → length dict from a .fai index. Reference: utils.py:72-79."""
    chromosome_lengths = {}
    with open(genome_fai_filename, 'r') as f:
        for row in csv.reader(f, delimiter='\t'):
            chromosome_lengths[row[0]] = int(row[1])
    return chromosome_lengths


def merge_files(output_filename, *input_filenames):
    """Concatenate files. Reference: utils.py:82-86."""
    with open(output_filename, 'w') as output_file:
        for input_filename in input_filenames:
            with open(input_filename, 'r') as input_file:
                shutil.copyfileobj(input_file, output_file)


def read_table_raw(filename):
    """Read a TSV with every column as string. Reference: utils.py:89-93."""
    peek = pd.read_csv(filename, sep='\t', nrows=1)
    dtypes = {c: str for c in peek.columns}
    return pd.read_csv(filename, sep='\t', dtype=dtypes)


def split_table(output_filenames, input_filename, num_rows):
    """Shard a TSV into chunks of `num_rows`. Reference: utils.py:96-99."""
    input_data = read_table_raw(input_filename)
    for idx, start_row in enumerate(range(0, len(input_data.index), num_rows)):
        input_data.iloc[start_row:start_row + num_rows].to_csv(
            output_filenames[idx], sep='\t', index=False)


def merge_tables(output_filename, *input_filenames):
    """Concatenate TSV shards. Reference: utils.py:102-106."""
    if len(input_filenames) == 1 and isinstance(input_filenames[0], dict):
        input_filenames = list(input_filenames[0].values())
    input_data = [read_table_raw(fname) for fname in input_filenames]
    pd.concat(input_data).to_csv(output_filename, sep='\t', index=False)


def link_file(target_filename, link_filename):
    """Force-create a symlink. Reference: utils.py:109-114."""
    try:
        os.remove(link_filename)
    except OSError:
        pass
    os.symlink(os.path.abspath(target_filename), link_filename)


def sort_chromosome_names(chromosomes):
    """Numeric-first chromosome ordering. Reference: utils.py:117-123."""
    def key(chromosome):
        try:
            return (0, int(chromosome))
        except ValueError:
            return (1, chromosome)
    return sorted(chromosomes, key=key)


class BreakpointDatabase:
    """Fuzzy (chromosome, strand, position±extend) breakpoint matcher.

    Reference: utils.py:126-186. Query returns the prediction_id whose two
    breakends both fall within `extend` of the queried breakends (opposite
    sides), minimizing total distance; None when unmatched.
    """

    _COLS = [
        'prediction_id',
        'chromosome_1', 'strand_1', 'position_1',
        'chromosome_2', 'strand_2', 'position_2',
    ]

    def __init__(self, breakpoints):
        self.positions = collections.defaultdict(list)
        self.prediction_ids = collections.defaultdict(set)
        for _, row in breakpoints[self._COLS].drop_duplicates().iterrows():
            for side in ('1', '2'):
                chrom = row['chromosome_' + side]
                strand = row['strand_' + side]
                pos = row['position_' + side]
                self.positions[(chrom, strand)].append(pos)
                self.prediction_ids[(chrom, strand, pos)].add((row['prediction_id'], side))
        for key in self.positions:
            self.positions[key] = sorted(self.positions[key])

    def query(self, row, extend=0):
        matched_ids = []
        for side in ('1', '2'):
            chrom = row['chromosome_' + side]
            strand = row['strand_' + side]
            target = row['position_' + side]
            positions = self.positions[(chrom, strand)]
            idx = bisect.bisect_left(positions, target - extend)
            side_matched = []
            while idx < len(positions):
                pos = positions[idx]
                if pos > target + extend:
                    break
                if pos >= target - extend:
                    dist = abs(pos - target)
                    for prediction_id in self.prediction_ids[(chrom, strand, pos)]:
                        side_matched.append((prediction_id, dist))
                idx += 1
            matched_ids.append(side_matched)

        candidates = []
        for (id_1, side_1), dist_1 in matched_ids[0]:
            for (id_2, side_2), dist_2 in matched_ids[1]:
                if id_1 == id_2 and side_1 != side_2:
                    candidates.append((dist_1 + dist_2, id_1))
        if not candidates:
            return None
        return sorted(candidates)[0][1]


def wget(url, filename):
    """Resumable download. Reference: utils.py:196-199."""
    temp_filename = filename + '.tmp'
    subprocess.check_call(['wget', url, '-c', '-O', temp_filename])
    os.rename(temp_filename, filename)


def wget_gunzip(url, filename):
    """Download then gunzip. Reference: utils.py:189-193."""
    temp_filename = filename + '.tmp'
    subprocess.check_call(['wget', url, '-c', '-O', temp_filename + '.gz'])
    subprocess.check_call(['gunzip', temp_filename + '.gz'])
    os.rename(temp_filename, filename)


class AutoSentinal:
    """Sentinel-file guarded idempotent steps. Reference: utils.py:202-212."""

    def __init__(self, sentinal_prefix):
        self.sentinal_prefix = sentinal_prefix

    def run(self, func):
        sentinal_filename = self.sentinal_prefix + func.__name__
        if os.path.exists(sentinal_filename):
            return
        func()
        with open(sentinal_filename, 'w'):
            pass
