"""Host-side utilities: weighted sampling, FASTA/FAI io, table sharding,
fuzzy breakpoint matching, idempotent-step sentinels.

API parity with /root/reference/remixt/utils.py:13-212. Implementations are
original: seeded-local-RNG resampling (no global RNG state swap), pandas
string-dtype table sharding, a searchsorted-window breakpoint matcher, and
subprocess-based downloads.
"""

import collections
import os
import shutil
import subprocess

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# Weighted sampling
# ---------------------------------------------------------------------------

def weighted_resample(data, weights, num_samples=10000, seed=1234):
    """Multinomial resample of ``data`` proportional to ``weights``.

    Draws from a private seeded RNG so callers' random streams are
    untouched while the resample itself stays deterministic (the reference
    swaps the global numpy RNG state for the same effect, utils.py:13-29;
    RandomState(seed) reproduces its exact draw).
    """
    p = np.asarray(weights, dtype=float)
    counts = np.random.RandomState(seed).multinomial(num_samples, p / p.sum())
    return np.repeat(data, counts)


def weighted_percentile(data, weights, percentile, num_samples=10000):
    """Percentile of a weighted-resampled dataset (utils.py:32-34)."""
    return np.percentile(
        weighted_resample(data, weights, num_samples=num_samples), percentile)


# ---------------------------------------------------------------------------
# FASTA / FAI
# ---------------------------------------------------------------------------

def read_sequences(fasta_filename):
    """Yield (sequence id, sequence) records from a FASTA (utils.py:37-53)."""
    def flush(header, parts):
        if header is not None:
            yield header.split()[0], ''.join(parts)

    header, parts = None, []
    with open(fasta_filename, 'rt') as fasta:
        for raw in fasta:
            stripped = raw.strip()
            if stripped.startswith('>'):
                yield from flush(header, parts)
                header, parts = stripped[1:], []
            elif stripped:
                parts.append(stripped)
    yield from flush(header, parts)


def write_sequence(fasta, seq_id, sequence, width=80):
    """Write one FASTA record wrapped at ``width`` columns (utils.py:56-65)."""
    fasta.write('>{}\n'.format(seq_id))
    fasta.writelines(
        sequence[pos:pos + width] + '\n'
        for pos in range(0, len(sequence), width))


_DNA_COMPLEMENT = str.maketrans('ACTGactg', 'TGACtgac')


def reverse_complement(sequence):
    """Reverse complement of a DNA string (utils.py:68-69)."""
    return sequence.translate(_DNA_COMPLEMENT)[::-1]


def read_chromosome_lengths(genome_fai_filename):
    """{chromosome: length} from a samtools .fai index (utils.py:72-79)."""
    fai = pd.read_csv(genome_fai_filename, sep='\t', header=None,
                      usecols=[0, 1], names=['chromosome', 'length'],
                      dtype={'chromosome': str})
    return dict(zip(fai['chromosome'], fai['length'].astype(int)))


def sort_chromosome_names(chromosomes):
    """Chromosomes in numeric order first, lexical names after
    (utils.py:117-123)."""
    numeric = sorted(
        (c for c in chromosomes if str(c).isdigit()), key=int)
    named = sorted(c for c in chromosomes if not str(c).isdigit())
    return numeric + named


# ---------------------------------------------------------------------------
# File and table plumbing
# ---------------------------------------------------------------------------

def merge_files(output_filename, *input_filenames):
    """Concatenate files byte-for-byte (utils.py:82-86)."""
    with open(output_filename, 'wb') as merged:
        for name in input_filenames:
            with open(name, 'rb') as part:
                shutil.copyfileobj(part, merged)


def read_table_raw(filename):
    """TSV with every column kept as string (utils.py:89-93)."""
    return pd.read_csv(filename, sep='\t', dtype=str)


def split_table(output_filenames, input_filename, num_rows):
    """Shard a TSV into consecutive ``num_rows`` chunks (utils.py:96-99)."""
    table = read_table_raw(input_filename)
    num_shards = -(-len(table.index) // num_rows)
    for shard in range(num_shards):
        table.iloc[shard * num_rows:(shard + 1) * num_rows].to_csv(
            output_filenames[shard], sep='\t', index=False)


def merge_tables(output_filename, *input_filenames):
    """Concatenate TSV shards back into one table (utils.py:102-106)."""
    if len(input_filenames) == 1 and isinstance(input_filenames[0], dict):
        input_filenames = list(input_filenames[0].values())
    pd.concat(map(read_table_raw, input_filenames)).to_csv(
        output_filename, sep='\t', index=False)


def link_file(target_filename, link_filename):
    """Create or replace a symlink to ``target_filename`` (utils.py:109-114)."""
    if os.path.lexists(link_filename):
        os.remove(link_filename)
    os.symlink(os.path.abspath(target_filename), link_filename)


# ---------------------------------------------------------------------------
# Fuzzy breakpoint matching
# ---------------------------------------------------------------------------

class BreakpointDatabase:
    """Fuzzy (chromosome, strand, position ± extend) breakpoint matcher.

    Capability parity with reference utils.py:126-186; built on sorted
    per-(chromosome, strand) position arrays queried with searchsorted
    windows instead of the reference's bisect walk. ``query`` returns the
    prediction id whose two breakends fall within ``extend`` of the probed
    breakends on opposite sides, minimizing summed distance, else None.
    """

    def __init__(self, breakpoints):
        long_form = []
        for side in ('1', '2'):
            part = breakpoints[[
                'prediction_id', 'chromosome_' + side, 'strand_' + side,
                'position_' + side]].copy()
            part.columns = ['prediction_id', 'chromosome', 'strand',
                            'position']
            part['side'] = side
            long_form.append(part)
        long_form = pd.concat(long_form, ignore_index=True).drop_duplicates()

        self._index = {}
        for (chrom, strand), group in long_form.groupby(
                ['chromosome', 'strand']):
            ordered = group.sort_values('position', kind='mergesort')
            self._index[(chrom, strand)] = (
                ordered['position'].values,
                list(zip(ordered['prediction_id'], ordered['side'])))

    def _breakends_near(self, chrom, strand, target, extend):
        """[(prediction_id, side, distance)] within the extend window."""
        if (chrom, strand) not in self._index:
            return []
        positions, labels = self._index[(chrom, strand)]
        lo, hi = np.searchsorted(
            positions, [target - extend, target + extend + 1])
        return [(pid, side, abs(int(positions[i]) - int(target)))
                for i, (pid, side) in zip(range(lo, hi), labels[lo:hi])]

    def query(self, row, extend=0):
        near = [
            self._breakends_near(row['chromosome_' + probe_side],
                                 row['strand_' + probe_side],
                                 row['position_' + probe_side], extend)
            for probe_side in ('1', '2')]

        best = None
        for pid_1, side_1, d1 in near[0]:
            for pid_2, side_2, d2 in near[1]:
                if pid_1 == pid_2 and side_1 != side_2:
                    key = (d1 + d2, pid_1)
                    if best is None or key < best:
                        best = key
        return best[1] if best is not None else None


# ---------------------------------------------------------------------------
# Downloads and sentinels
# ---------------------------------------------------------------------------

def wget(url, filename):
    """Resumable download into place (utils.py:196-199)."""
    staging = filename + '.tmp'
    subprocess.check_call(['wget', url, '-c', '-O', staging])
    os.rename(staging, filename)


def wget_gunzip(url, filename):
    """Download a .gz and decompress into place (utils.py:189-193)."""
    staging = filename + '.tmp'
    subprocess.check_call(['wget', url, '-c', '-O', staging + '.gz'])
    subprocess.check_call(['gunzip', staging + '.gz'])
    os.rename(staging, filename)


class AutoSentinal:
    """Run idempotent steps once, guarded by sentinel files
    (utils.py:202-212); the step function's name keys its sentinel."""

    def __init__(self, sentinal_prefix):
        self.sentinal_prefix = sentinal_prefix

    def run(self, step):
        marker = self.sentinal_prefix + step.__name__
        if not os.path.exists(marker):
            step()
            open(marker, 'w').close()
