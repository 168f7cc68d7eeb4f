"""Rearranged genome simulation with replayable event histories.

Capability parity with /root/reference/remixt/simulations/experiment.py:16-1399:

* :class:`RearrangedGenome` — chromosomes as sequences of oriented
  (segment, allele) copies; seeded double-cut-join / duplication / deletion /
  WGD events with stored (params, seed) history enabling exact ``recreate``
  and ``rewind``; derived copy-number matrices, breakpoint copy numbers,
  LOH/hdel/hlamp/ploidy/divergence statistics; sequence realization.
* :class:`RearrangementHistorySampler` — particle-filter evolution with
  fitness resampling toward target ploidy/LOH/hdel/hlamp proportions.
* :class:`GenomeCollection` / :class:`GenomeCollectionSampler` — chain
  phylogeny normal → ancestor → subclones.
* :class:`GenomeMixture` / :class:`GenomeMixtureSampler` — clone mixing
  fractions plus detected/false breakpoint simulation.
* :class:`Experiment` / :class:`ExperimentSampler` — read-count emission
  through the model's own distributions.
"""

import collections
import math

import numpy as np
import pandas as pd
import scipy.special
import scipy.stats

import remixt_tpu.likelihood
import remixt_tpu.utils

MAX_SEED = 2**32


class RearrangedGenome(object):
    """Rearranged genome with stored, replayable history.

    A 'segment copy' is ((segment, allele), orientation); a 'breakend' is
    ((segment, allele), side); a 'breakpoint' is a frozenset of two
    breakends. Chromosomes are circular tuples of segment copies.
    """

    default_params = {
        'genome_length': 3e9,
        'seg_length_concentration': 1.0,
        'seg_length_min': 50000,
        'num_chromosomes': 20,
        'chrom_length_concentration': 5.,
        'chromosome_lengths': None,
        'event_type': ['dcj', 'dup', 'del', 'wgd'],
        'event_prob': [0.19, 0.3, 0.5, 0.01],
        'del_prop_len': 0.5,
        'dup_prop_len': 0.5,
        'wgd_prop_dup': 0.8,
    }

    def __init__(self, N):
        self.N = N
        self.init_params = None
        self.init_seed = None
        self.event_params = list()
        self.event_seeds = list()

    def copy(self):
        """Copy safe for further independent rearrangement."""
        genome = RearrangedGenome(self.N)
        genome.init_params = self.init_params
        genome.init_seed = self.init_seed
        genome.segment_start = self.segment_start
        genome.segment_end = self.segment_end
        genome.segment_chromosome_id = self.segment_chromosome_id
        genome.l = self.l
        genome.wt_adj = self.wt_adj
        genome.event_params = list(self.event_params)
        genome.event_seeds = list(self.event_seeds)
        genome.chromosomes = list(self.chromosomes)
        return genome

    # -- creation and replay -------------------------------------------------

    def create(self, params):
        """Create a fresh wild-type genome, recording the init seed."""
        seed = np.random.randint(MAX_SEED - 1)
        np.random.seed(seed)
        self.random_chromosomes(params)
        self.init_params = params
        self.init_seed = seed

    def rewind(self, num_events):
        """Truncate the event history and replay."""
        self.event_params = self.event_params[:num_events]
        self.event_seeds = self.event_seeds[:num_events]
        self.recreate()

    def recreate(self):
        """Deterministically rebuild the genome from stored seeds."""
        np.random.seed(self.init_seed)
        self.random_chromosomes(self.init_params)
        for params, seed in zip(self.event_params, self.event_seeds):
            np.random.seed(seed)
            self.random_event(params)

    def random_chromosomes(self, params):
        """Dirichlet chromosome/segment length layout; two alleles per
        chromosome, all unit orientation."""
        if params.get('chromosome_lengths', None) is not None:
            chromosome_ids = list(params['chromosome_lengths'].keys())
            chromosome_lengths = np.array(list(params['chromosome_lengths'].values()))
        else:
            num_chroms = params['num_chromosomes']
            genome_length = params['genome_length']
            concentration = params['chrom_length_concentration']

            chromosome_ids = [str(a) for a in range(1, num_chroms + 1)]
            chromosome_lengths = np.random.dirichlet(
                [concentration] * num_chroms) * genome_length
            chromosome_lengths = np.sort(chromosome_lengths)[::-1]

        chrom_pvals = chromosome_lengths.astype(float) / float(chromosome_lengths.sum())
        chrom_num_segments = np.random.multinomial(
            self.N - len(chromosome_lengths), pvals=chrom_pvals)
        chrom_num_segments += 1

        seg_length_concentration = params['seg_length_concentration']
        seg_length_min = params['seg_length_min']

        self.l = np.array([])
        self.segment_chromosome_id = np.array([], dtype=str)
        self.segment_start = np.array([], dtype=int)
        self.segment_end = np.array([], dtype=int)

        for chrom_id, chrom_length, num_segments in zip(
                chromosome_ids, chromosome_lengths, chrom_num_segments):
            length_proportions = np.random.dirichlet(
                [seg_length_concentration] * num_segments)
            length_proportions = np.maximum(
                length_proportions, float(seg_length_min) / chrom_length)
            length_proportions /= length_proportions.sum()
            lengths = (length_proportions * chrom_length).astype(int)
            lengths[-1] = int(chrom_length) - lengths[:-1].sum()
            assert lengths[-1] > 0

            ends = lengths.cumsum()
            starts = ends - lengths

            self.l = np.concatenate((self.l, lengths))
            self.segment_chromosome_id = np.concatenate(
                (self.segment_chromosome_id, [chrom_id] * num_segments))
            self.segment_start = np.concatenate((self.segment_start, starts))
            self.segment_end = np.concatenate((self.segment_end, ends))

        segment_idx = 0
        self.chromosomes = list()
        for num_seg in chrom_num_segments:
            for allele in (0, 1):
                chrom_segs = range(segment_idx, segment_idx + num_seg)
                chrom_alleles = [allele] * num_seg
                chrom_orient = [1] * num_seg
                self.chromosomes.append(tuple(
                    zip(zip(chrom_segs, chrom_alleles), chrom_orient)))
            segment_idx += num_seg

        self.wt_adj = set()
        self.wt_adj = set(self.breakpoints)

    # -- events --------------------------------------------------------------

    def generate_cuts(self):
        """All possible cuts: (chromosome idx, second-of-adjacent-pair idx)."""
        for chromosome_idx, chromosome in enumerate(self.chromosomes):
            for segment_idx in range(len(chromosome)):
                yield (chromosome_idx, (segment_idx + 1) % len(chromosome))

    def random_cut(self):
        cuts = list(self.generate_cuts())
        return cuts[np.random.choice(range(len(cuts)))]

    def random_cut_pair(self):
        cuts = list(self.generate_cuts())
        idx1, idx2 = np.random.choice(range(len(cuts)), size=2, replace=False)
        return (cuts[idx1], cuts[idx2])

    @staticmethod
    def reverse_segment(segment):
        return (segment[0], segment[1] * -1)

    def reverse_chromosome(self, chromosome):
        return tuple(self.reverse_segment(a) for a in reversed(chromosome))

    def rearrange(self, params):
        """Apply one seeded random event, appending to the history."""
        seed = np.random.randint(MAX_SEED - 1)
        np.random.seed(seed)
        self.random_event(params)
        self.event_params.append(params)
        self.event_seeds.append(seed)

    def random_event(self, params):
        event = np.random.choice(params['event_type'], p=params['event_prob'])
        if event == 'dcj':
            self.random_double_cut_join(params)
        elif event == 'dup':
            self.random_duplication(params)
        elif event == 'del':
            self.random_deletion(params)
        elif event == 'wgd':
            self.random_whole_genome_doubling(params)

    def random_double_cut_join(self, params):
        """Break at two locations and rejoin, possibly with inversion."""
        if len(self.chromosomes) < 2:
            return

        breakpoint_1, breakpoint_2 = sorted(self.random_cut_pair())
        dcj_flip = np.random.choice([True, False])

        if breakpoint_1[0] != breakpoint_2[0]:
            chromosome_1 = self.chromosomes[breakpoint_1[0]]
            chromosome_2 = self.chromosomes[breakpoint_2[0]]

            del self.chromosomes[breakpoint_1[0]]
            del self.chromosomes[breakpoint_2[0] - 1]

            if dcj_flip:
                new_chromosome = (
                    chromosome_1[:breakpoint_1[1]]
                    + self.reverse_chromosome(chromosome_2[:breakpoint_2[1]])
                    + self.reverse_chromosome(chromosome_2[breakpoint_2[1]:])
                    + chromosome_1[breakpoint_1[1]:])
                assert len(new_chromosome) > 0
                self.chromosomes.append(new_chromosome)
            else:
                new_chromosome = (
                    chromosome_1[:breakpoint_1[1]]
                    + chromosome_2[breakpoint_2[1]:]
                    + chromosome_2[:breakpoint_2[1]]
                    + chromosome_1[breakpoint_1[1]:])
                assert len(new_chromosome) > 0
                self.chromosomes.append(new_chromosome)
        else:
            chromosome = self.chromosomes[breakpoint_1[0]]
            del self.chromosomes[breakpoint_1[0]]

            if dcj_flip:
                new_chromosome = (
                    chromosome[:breakpoint_1[1]]
                    + self.reverse_chromosome(chromosome[breakpoint_1[1]:breakpoint_2[1]])
                    + chromosome[breakpoint_2[1]:])
                assert len(new_chromosome) > 0
                self.chromosomes.append(new_chromosome)
            else:
                new_chromosome_1 = (chromosome[:breakpoint_1[1]]
                                    + chromosome[breakpoint_2[1]:])
                new_chromosome_2 = chromosome[breakpoint_1[1]:breakpoint_2[1]]
                assert len(new_chromosome_1) > 0
                assert len(new_chromosome_2) > 0
                self.chromosomes.append(new_chromosome_1)
                self.chromosomes.append(new_chromosome_2)

    def random_deletion(self, params):
        """Delete a run of consecutive segment copies."""
        if len(self.chromosomes) == 0:
            return

        breakpoint_1 = self.random_cut()
        chromosome = self.chromosomes[breakpoint_1[0]]
        del self.chromosomes[breakpoint_1[0]]

        chrom_length = len(chromosome)
        deletion_length = np.random.randint(
            0, math.ceil(params['del_prop_len'] * chrom_length))
        if deletion_length == 0:
            self.chromosomes.append(chromosome)
            return

        breakpoint_2 = (breakpoint_1[0],
                        (breakpoint_1[1] + deletion_length) % chrom_length)

        if breakpoint_1[1] < breakpoint_2[1]:
            new_chromosome = (chromosome[:breakpoint_1[1]]
                              + chromosome[breakpoint_2[1]:])
            self.chromosomes.append(new_chromosome)
        else:
            new_chromosome = chromosome[breakpoint_2[1]:breakpoint_1[1]]
            self.chromosomes.append(new_chromosome)

    def random_duplication(self, params):
        """Tandem-duplicate a run of consecutive segment copies."""
        if len(self.chromosomes) == 0:
            return

        breakpoint_1 = self.random_cut()
        chromosome = self.chromosomes[breakpoint_1[0]]
        del self.chromosomes[breakpoint_1[0]]

        chrom_length = len(chromosome)
        duplication_length = np.random.randint(
            0, math.ceil(params['dup_prop_len'] * chrom_length))

        breakpoint_2 = (breakpoint_1[0],
                        (breakpoint_1[1] + duplication_length) % chrom_length)

        if breakpoint_1[1] < breakpoint_2[1]:
            new_chromosome = (chromosome[:breakpoint_2[1]]
                              + chromosome[breakpoint_1[1]:])
            self.chromosomes.append(new_chromosome)
        else:
            new_chromosome = (chromosome
                              + chromosome[:breakpoint_2[1]]
                              + chromosome[breakpoint_1[1]:])
            self.chromosomes.append(new_chromosome)

    def random_whole_genome_doubling(self, params):
        duplicated = []
        for chromosome in self.chromosomes:
            if np.random.rand() < params['wgd_prop_dup']:
                duplicated.append(chromosome)
        self.chromosomes.extend(duplicated)

    # -- derived state -------------------------------------------------------

    @property
    def segment_copy_number(self):
        """(N, 2) allele copy-number matrix."""
        cn_matrix = np.zeros((self.N, 2))
        for chromosome in self.chromosomes:
            for segment in chromosome:
                cn_matrix[segment[0][0], segment[0][1]] += 1.0
        return cn_matrix

    @property
    def breakpoint_copy_number(self):
        """Counter of non-wild-type adjacencies present in the genome."""
        brk_cn = collections.Counter()
        for chromosome_idx, segment_idx_2 in self.generate_cuts():
            chromosome = self.chromosomes[chromosome_idx]
            segment_idx_1 = (segment_idx_2 - 1) % len(chromosome)

            segment_1 = chromosome[segment_idx_1]
            segment_2 = chromosome[segment_idx_2]

            side_1 = (0, 1)[segment_1[1] == 1]
            side_2 = (1, 0)[segment_2[1] == 1]

            breakpoint = frozenset([(segment_1[0], side_1), (segment_2[0], side_2)])

            if breakpoint in self.wt_adj:
                continue
            brk_cn[breakpoint] += 1

        return brk_cn

    @property
    def breakpoints(self):
        return list(self.breakpoint_copy_number.keys())

    def length_loh(self):
        cn = self.segment_copy_number
        return (((cn.min(axis=1) == 0) * 1) * self.l).sum()

    def proportion_loh(self):
        return self.length_loh() / float(self.l.sum())

    def length_hdel(self):
        cn = self.segment_copy_number
        return (((cn.max(axis=1) == 0) * 1) * self.l).sum()

    def proportion_hdel(self):
        return self.length_hdel() / float(self.l.sum())

    def length_hlamp(self, hlamp_min=6):
        cn = self.segment_copy_number
        return (((cn.sum(axis=1) >= hlamp_min) * 1) * self.l).sum()

    def proportion_hlamp(self, hlamp_min=6):
        return self.length_hlamp(hlamp_min=hlamp_min) / float(self.l.sum())

    def length_divergent(self, other):
        cn = self.segment_copy_number
        other_cn = other.segment_copy_number
        divergent = ((cn - other_cn > 0) * 1).sum(axis=1)
        return (divergent * self.l).sum()

    def proportion_divergent(self, other):
        return self.length_divergent(other) / float(self.l.sum())

    def ploidy(self):
        cn = self.segment_copy_number.sum(axis=1)
        return (cn * self.l).sum() / self.l.sum()

    def proportion_minor_state(self, cn_max=6):
        minor = np.minimum(self.segment_copy_number.min(axis=1), cn_max)
        return np.bincount(minor.astype(int), weights=self.l,
                           minlength=cn_max + 1) / self.l.sum()

    def proportion_major_state(self, cn_max=6):
        major = np.minimum(self.segment_copy_number.max(axis=1), cn_max)
        return np.bincount(major.astype(int), weights=self.l,
                           minlength=cn_max + 1) / self.l.sum()

    def create_chromosome_sequences(self, germline_genome):
        """Realize rearranged chromosome sequences from germline allele
        sequences keyed by (chromosome, allele_id)."""
        rearranged_genome = list()
        for chrom in self.chromosomes:
            rearranged_chromosome = list()
            for ((segment_idx, allele_id), orientation) in chrom:
                chromosome_id = self.segment_chromosome_id[segment_idx]
                start = self.segment_start[segment_idx]
                end = self.segment_end[segment_idx]
                segment_sequence = germline_genome[(chromosome_id, allele_id)][start:end]
                if orientation < 0:
                    segment_sequence = remixt_tpu.utils.reverse_complement(segment_sequence)
                rearranged_chromosome.append(segment_sequence)
            rearranged_genome.append(''.join(rearranged_chromosome))
        return rearranged_genome


class RearrangementHistorySampler(object):
    """Particle-filter genome evolution with fitness resampling toward
    target LOH/hdel/hlamp/ploidy proportions."""

    def __init__(self, params):
        self.N = params.get('N', 1000)

        self.genome_params = dict(RearrangedGenome.default_params)
        for key in self.genome_params.keys():
            if key in params:
                self.genome_params[key] = params[key]

        self.proportion_hdel = params.get('proportion_hdel', 0.)
        self.proportion_hdel_stddev = params.get('proportion_hdel_stddev', 0.001)
        self.proportion_hlamp = params.get('proportion_hlamp', 0.)
        self.proportion_hlamp_stddev = params.get('proportion_hlamp_stddev', 0.001)
        self.ploidy = params.get('ploidy', 2.5)
        self.ploidy_stddev = params.get('ploidy_stddev', 0.1)
        self.proportion_loh = params.get('proportion_loh', 0.2)
        self.proportion_loh_stddev = params.get('proportion_loh_stddev', 0.02)

        self.num_swarm = params.get('num_swarm', 100)

    def genome_fitness(self, genome, fitness_callback=None):
        fitness = (
            scipy.stats.norm.logpdf(genome.proportion_hdel(),
                                    loc=self.proportion_hdel,
                                    scale=self.proportion_hdel_stddev)
            + scipy.stats.norm.logpdf(genome.proportion_hlamp(),
                                      loc=self.proportion_hlamp,
                                      scale=self.proportion_hlamp_stddev)
            + scipy.stats.norm.logpdf(genome.ploidy(),
                                      loc=self.ploidy, scale=self.ploidy_stddev)
            + scipy.stats.norm.logpdf(genome.proportion_loh(),
                                      loc=self.proportion_loh,
                                      scale=self.proportion_loh_stddev))
        if fitness_callback is not None:
            fitness = fitness_callback(genome, fitness)
        return fitness

    def resample_probs(self, genomes, fitness_callback=None):
        fitnesses = np.array([
            self.genome_fitness(genome, fitness_callback) for genome in genomes])
        return np.exp(fitnesses - scipy.special.logsumexp(fitnesses))

    def sample_wild_type(self):
        wt_genome = RearrangedGenome(self.N)
        wt_genome.create(self.genome_params)
        return wt_genome

    def sample_rearrangement_history(self, genome_init, num_events,
                                     fitness_callback=None):
        """Evolve a swarm of genomes, resampling by fitness each event;
        returns the swarm sorted by decreasing resample probability."""
        swarm = [genome_init] * self.num_swarm

        for _ in range(num_events):
            new_swarm = list()
            for genome in swarm:
                genome = genome.copy()
                genome.rearrange(self.genome_params)
                new_swarm.append(genome)

            resample_p = self.resample_probs(new_swarm, fitness_callback=fitness_callback)
            resampled = np.random.choice(new_swarm, size=self.num_swarm, p=resample_p)
            swarm = list(resampled)

        prob = self.resample_probs(swarm)
        return list(np.array(swarm)[np.argsort(prob)[::-1]])


def _collapse_allele_bp(allele_bp):
    ((n_1, ell_1), side_1), ((n_2, ell_2), side_2) = allele_bp
    return frozenset([(n_1, side_1), (n_2, side_2)])


def _sum_brk_cn_alleles(allele_brk_cn):
    total_brk_cn = {}
    for allele_bp, cn in allele_brk_cn.items():
        total_bp = _collapse_allele_bp(allele_bp)
        if total_bp not in total_brk_cn:
            total_brk_cn[total_bp] = np.array(cn).copy()
        else:
            total_brk_cn[total_bp] = total_brk_cn[total_bp] + cn
    return total_brk_cn


def _collapse_allele_bps(allele_bps):
    return set(_collapse_allele_bp(bp) for bp in allele_bps)


class GenomeCollection(object):
    """Normal + tumour clone genomes with aggregated copy-number state."""

    def __init__(self, genomes):
        self.genomes = genomes

        self.cn = np.array([g.segment_copy_number for g in self.genomes]).swapaxes(0, 1)

        self.adjacencies = set()
        for breakends in self.genomes[0].wt_adj:
            adj = [None, None]
            for breakend in breakends:
                adj[1 - breakend[1]] = breakend[0][0]
            assert None not in adj
            self.adjacencies.add(tuple(adj))

        self.breakpoints = set()
        for genome in self.genomes[1:]:
            for brkend_1, brkend_2 in genome.breakpoints:
                brkend_1 = (brkend_1[0][0], brkend_1[1])
                brkend_2 = (brkend_2[0][0], brkend_2[1])
                self.breakpoints.add(frozenset([brkend_1, brkend_2]))

        self.breakpoint_copy_number = collections.defaultdict(
            lambda: np.zeros(self.M))
        for m in range(self.M):
            for breakpoint, brk_cn in self.genomes[m].breakpoint_copy_number.items():
                self.breakpoint_copy_number[breakpoint][m] = brk_cn
        self.breakpoint_copy_number = dict(self.breakpoint_copy_number)

        self.balanced_breakpoints = set()
        for breakpoint, brk_cn in self.breakpoint_copy_number.items():
            brk_cn_sum = 0
            for (n, ell), side_1 in breakpoint:
                if side_1 == 1:
                    n_2 = (n + 1) % self.N
                else:
                    n_2 = (n - 1) % self.N
                brk_cn_sum += abs((self.cn[n, :, ell] - self.cn[n_2, :, ell]).sum())
            if brk_cn_sum == 0:
                self.balanced_breakpoints.add(breakpoint)

    @property
    def N(self):
        return self.genomes[0].N

    @property
    def M(self):
        return len(self.genomes)

    @property
    def l(self):
        return self.genomes[0].l

    @property
    def segment_chromosome_id(self):
        return self.genomes[0].segment_chromosome_id

    @property
    def segment_start(self):
        return self.genomes[0].segment_start

    @property
    def segment_end(self):
        return self.genomes[0].segment_end

    def length_divergent(self):
        return self.genomes[1].length_divergent(self.genomes[2])

    def length_loh(self):
        return [g.length_loh() for g in self.genomes]

    def length_hdel(self):
        return [g.length_hdel() for g in self.genomes]

    def length_hlamp(self, hlamp_min=6):
        return [g.length_hlamp() for g in self.genomes]

    def collapsed_breakpoint_copy_number(self):
        return _sum_brk_cn_alleles(self.breakpoint_copy_number)

    def collapsed_minimal_breakpoint_copy_number(self):
        import remixt_tpu.simulations.balanced
        minimal = remixt_tpu.simulations.balanced.minimize_breakpoint_copies(
            self.adjacencies, self.breakpoint_copy_number)
        return _sum_brk_cn_alleles(minimal)

    def collapsed_balanced_breakpoints(self):
        return _collapse_allele_bps(self.balanced_breakpoints)


class GenomeCollectionSampler(object):
    """Chain-phylogeny sampler: wild type → ancestor → subclones, with
    acceptance filters on ploidy/LOH/subclonal proportion."""

    def __init__(self, rearrangement_history_sampler, params):
        self.rh_sampler = rearrangement_history_sampler

        self.num_ancestral_events = params.get('num_ancestral_events', 25)
        self.num_descendent_events = params.get('num_descendent_events', 10)
        self.M = params['M']
        self.ploidy = params.get('ploidy', 2.5)
        self.ploidy_max_error = params.get('ploidy_max_error', 0.2)
        self.proportion_loh = params.get('proportion_loh', 0.2)
        self.proportion_loh_max_error = params.get('proportion_loh_max_error', 0.02)
        self.proportion_subclonal = params.get('proportion_subclonal', 0.3)
        self.proportion_subclonal_max_error = params.get(
            'proportion_subclonal_max_error', 0.02)
        self.proportion_subclonal_stddev = params.get(
            'proportion_subclonal_stddev', 0.02)

    def sample_genome_collection(self):
        wt_genome = self.rh_sampler.sample_wild_type()
        genomes = [wt_genome]

        ancestral_genome = None
        for _ in range(100):
            candidates = np.array(self.rh_sampler.sample_rearrangement_history(
                wt_genome, self.num_ancestral_events))

            ploidys = np.array([g.ploidy() for g in candidates])
            candidates = candidates[
                np.absolute(ploidys - self.ploidy) < self.ploidy_max_error]
            if len(candidates) == 0:
                continue

            loh = np.array([g.proportion_loh() for g in candidates])
            candidates = candidates[
                np.absolute(loh - self.proportion_loh) < self.proportion_loh_max_error]
            if len(candidates) == 0:
                continue

            ancestral_genome = candidates[0]
            genomes.append(ancestral_genome)
            break

        if ancestral_genome is None:
            raise ValueError('unable to simulate ancestral genome')

        # The ancestor is an intermediate, not a mixture clone: the M-1
        # tumour clones are descendants sharing its events (chain phylogeny
        # normal -> ancestor -> subclones). The reference's loop
        # (experiment.py:938-960) appends the ancestor AND two descendants
        # regardless of M, yielding M+1 genomes for M=3; here the collection
        # always has exactly M genomes.
        genomes = [wt_genome]

        def subclone_fitness(genome, fitness):
            divergent_log_p = scipy.stats.norm.logpdf(
                genome.proportion_divergent(ancestral_genome),
                loc=self.proportion_subclonal,
                scale=self.proportion_subclonal_stddev)
            return fitness + divergent_log_p

        for m in range(1, self.M):
            success = False
            for _ in range(100):
                candidates = np.array(self.rh_sampler.sample_rearrangement_history(
                    ancestral_genome, self.num_descendent_events,
                    fitness_callback=subclone_fitness))

                subclonal = np.array([
                    g.proportion_divergent(ancestral_genome) for g in candidates])
                candidates = candidates[
                    np.absolute(subclonal - self.proportion_subclonal)
                    < self.proportion_subclonal_max_error]
                if len(candidates) == 0:
                    continue

                genomes.append(candidates[0])
                success = True
                break
            if not success:
                raise ValueError('unable to simulate descendant genome')

        return GenomeCollection(genomes)


def sample_random_breakpoints(N, num_breakpoints, adjacencies,
                              excluded_breakpoints=None):
    """False-positive breakpoint simulation, avoiding wild-type adjacencies
    and fold-back inversions."""
    breakpoints = set()
    while len(breakpoints) < num_breakpoints:
        n_1 = np.random.randint(N)
        n_2 = np.random.randint(N)
        side_1 = np.random.randint(2)
        side_2 = np.random.randint(2)

        if (n_1, n_2) in adjacencies and side_1 == 1 and side_2 == 0:
            continue
        if (n_2, n_1) in adjacencies and side_2 == 1 and side_1 == 0:
            continue
        if (n_1, side_1) == (n_2, side_2):
            continue

        breakpoint = frozenset([(n_1, side_1), (n_2, side_2)])
        if excluded_breakpoints is not None and breakpoint in excluded_breakpoints:
            continue
        breakpoints.add(breakpoint)

    return breakpoints


class GenomeMixture(object):
    """Mixture of genomes with fractions and detected breakpoints."""

    def __init__(self, genome_collection, frac, detected_breakpoints):
        self.genome_collection = genome_collection
        self.frac = frac
        self.detected_breakpoints = detected_breakpoints

        breakpoint_segment_data = list()
        for prediction_id, breakpoint in self.detected_breakpoints.items():
            breakpoint_info = {'prediction_id': prediction_id}
            for breakend_idx, breakend in enumerate(breakpoint):
                n, side = breakend
                if side == 0:
                    strand = '-'
                    position = self.segment_start[n]
                elif side == 1:
                    strand = '+'
                    position = self.segment_end[n]
                else:
                    raise Exception('unexpected side value')
                breakpoint_info['n_{}'.format(breakend_idx + 1)] = n
                breakpoint_info['side_{}'.format(breakend_idx + 1)] = side
                breakpoint_info['chromosome_{}'.format(breakend_idx + 1)] = (
                    self.segment_chromosome_id[n])
                breakpoint_info['position_{}'.format(breakend_idx + 1)] = position
                breakpoint_info['strand_{}'.format(breakend_idx + 1)] = strand
            breakpoint_segment_data.append(breakpoint_info)
        self.breakpoint_segment_data = pd.DataFrame(breakpoint_segment_data)

    @property
    def N(self):
        return self.genome_collection.N

    @property
    def M(self):
        return self.genome_collection.M

    @property
    def l(self):
        return self.genome_collection.l

    @property
    def segment_chromosome_id(self):
        return self.genome_collection.segment_chromosome_id

    @property
    def segment_start(self):
        return self.genome_collection.segment_start

    @property
    def segment_end(self):
        return self.genome_collection.segment_end

    @property
    def cn(self):
        return self.genome_collection.cn

    @property
    def adjacencies(self):
        return self.genome_collection.adjacencies

    @property
    def breakpoints(self):
        return self.genome_collection.breakpoints


class GenomeMixtureSampler(object):
    """Sample clone fractions and the detected/false breakpoint set."""

    def __init__(self, params):
        self.frac_normal = params.get('frac_normal', 0.4)
        self.frac_clone_concentration = params.get('frac_clone_concentration', 1.)
        self.frac_clone_1 = params.get('frac_clone_1', None)
        self.num_false_breakpoints = params.get('num_false_breakpoints', 50)
        self.proportion_breakpoints_detected = params.get(
            'proportion_breakpoints_detected', 0.9)

    def sample_genome_mixture(self, genome_collection):
        M = genome_collection.M

        frac = np.zeros((M,))
        frac[0] = self.frac_normal

        if self.frac_clone_1 is None:
            frac[1:] = np.random.dirichlet(
                [self.frac_clone_concentration] * (M - 1)) * (1 - self.frac_normal)
        elif M == 3:
            frac[1:] = np.array([
                self.frac_clone_1, 1. - self.frac_normal - self.frac_clone_1])
        elif M == 4:
            frac_rest = 1. - self.frac_normal - self.frac_clone_1
            frac_rest = np.random.dirichlet(
                [self.frac_clone_concentration] * (M - 2)) * frac_rest
            frac[1:] = np.array([self.frac_clone_1] + list(frac_rest))
        else:
            raise Exception('Case not handled')

        assert abs(1. - np.sum(frac)) < 1e-8

        num_detected = int(self.proportion_breakpoints_detected
                           * len(genome_collection.breakpoints))
        detected_breakpoints = list(genome_collection.breakpoints)
        np.random.shuffle(detected_breakpoints)
        detected_breakpoints = detected_breakpoints[:num_detected]

        false_breakpoints = sample_random_breakpoints(
            genome_collection.N,
            self.num_false_breakpoints,
            genome_collection.adjacencies,
            excluded_breakpoints=genome_collection.breakpoints,
        )
        detected_breakpoints.extend(false_breakpoints)

        detected_breakpoints = dict(enumerate(detected_breakpoints))

        return GenomeMixture(genome_collection, frac, detected_breakpoints)


class Experiment(object):
    """Sequencing experiment read counts over a known mixture."""

    def __init__(self, genome_mixture, h, phi, x, h_pred, **kwargs):
        self.genome_mixture = genome_mixture
        self.h = h
        self.phi = phi
        self.x = x
        self.h_pred = h_pred
        self.__dict__.update(kwargs)

    @property
    def N(self):
        return self.genome_mixture.N

    @property
    def M(self):
        return self.genome_mixture.M

    @property
    def l(self):
        return self.genome_mixture.l

    @property
    def segment_chromosome_id(self):
        return self.genome_mixture.segment_chromosome_id

    @property
    def segment_start(self):
        return self.genome_mixture.segment_start

    @property
    def segment_end(self):
        return self.genome_mixture.segment_end

    @property
    def cn(self):
        return self.genome_mixture.cn

    @property
    def adjacencies(self):
        return self.genome_mixture.adjacencies

    @property
    def chains(self):
        chain_start = [0]
        chain_end = [self.N]
        for idx in range(self.N - 1):
            if (idx, idx + 1) not in self.adjacencies:
                chain_end.append(idx + 1)
                chain_start.append(idx + 1)
        return zip(sorted(chain_start), sorted(chain_end))

    @property
    def breakpoints(self):
        return self.genome_mixture.detected_breakpoints

    @property
    def breakpoint_segment_data(self):
        return self.genome_mixture.breakpoint_segment_data


def _sample_negbin(mu, r):
    mu = mu + 1e-16
    inv_p = r / (r + mu)
    return np.random.negative_binomial(r, inv_p)


def _sample_negbin_mix(mu, r_0, r_1, mix):
    x_0 = _sample_negbin(mu, r_0)
    x_1 = _sample_negbin(mu, r_1)
    is_0 = np.random.random(size=x_0.shape) > mix
    return np.where(is_0, x_0, x_1), is_0


def _sample_betabin(n, p, M):
    p_binom = np.random.beta(M * p, M * (1 - p))
    return np.random.binomial(n, p_binom)


def _sample_betabin_mix(n, p, M_0, M_1, mix):
    x_0 = _sample_betabin(n, p, M_0)
    x_1 = _sample_betabin(n, p, M_1)
    is_0 = np.random.random(size=x_0.shape) > mix
    return np.where(is_0, x_0, x_1), is_0


class ExperimentSampler(object):
    """Emit read counts for a genome mixture through the model's own
    distributions (negbin totals + betabin allele ratios with outlier
    mixtures by default)."""

    def __init__(self, params):
        self.h_total = params.get('h_total', 0.1)
        self.phi_min = params.get('phi_min', 0.05)
        self.phi_max = params.get('phi_max', 0.2)
        self.emission_model = params.get('emission_model', 'negbin_betabin')

        if self.emission_model not in ('poisson', 'negbin', 'negbin_betabin'):
            raise ValueError(
                'emission_model must be one of "poisson", "negbin", "negbin_betabin"')

        self.frac_beta_noise_stddev = params.get('frac_beta_noise_stddev', None)
        self.params = params.copy()

    def sample_experiment(self, genome_mixture):
        N = genome_mixture.N
        l = genome_mixture.l
        cn = genome_mixture.cn

        h = genome_mixture.frac * self.h_total

        phi = np.random.uniform(low=self.phi_min, high=self.phi_max, size=N)

        mu = remixt_tpu.likelihood.expected_read_count(l, cn, h, phi)

        extra_params = dict()

        if self.emission_model == 'poisson':
            x = np.random.poisson(mu + 1e-16)

        elif self.emission_model == 'negbin':
            negbin_r = self.params.get('negbin_r', 500.)
            x = _sample_negbin(mu, negbin_r)
            extra_params['negbin_r'] = negbin_r

        elif self.emission_model == 'negbin_betabin':
            x = np.zeros(mu.shape)

            negbin_r_0 = self.params.get('negbin_r_0', 1000.)
            negbin_r_1 = self.params.get('negbin_r_1', 10.)
            negbin_mix = self.params.get('negbin_mix', 0.01)

            betabin_M_0 = self.params.get('betabin_M_0', 2000.)
            betabin_M_1 = self.params.get('betabin_M_1', 10.)
            betabin_mix = self.params.get('betabin_mix', 0.01)

            x_total, x_total_is_0 = _sample_negbin_mix(
                mu[:, 2] + 1e-16, negbin_r_0, negbin_r_1, negbin_mix)

            allele_total = (phi * x_total).astype(int)
            p_true = mu[:, 0] / (mu[:, 0:2].sum(axis=1) + 1e-16)
            p_true = np.clip(p_true, 1e-6, 1 - 1e-6)
            x_allele_1, x_allele_1_is_0 = _sample_betabin_mix(
                allele_total, p_true, betabin_M_0, betabin_M_1, betabin_mix)
            x_allele_2 = allele_total - x_allele_1

            x[:, 2] = x_total
            x[:, 0] = x_allele_1
            x[:, 1] = x_allele_2

            extra_params['is_outlier_total'] = ~x_total_is_0
            extra_params['is_outlier_allele'] = ~x_allele_1_is_0

        # reorder as major/minor/total; record which was allele a
        major_is_allele_a = x[:, 0] > x[:, 1]
        x[:, 0], x[:, 1] = (np.where(major_is_allele_a, x[:, 0], x[:, 1]),
                            np.where(major_is_allele_a, x[:, 1], x[:, 0]))
        extra_params['segment_major_is_allele_a'] = major_is_allele_a * 1

        def add_beta_noise(mu_f, var):
            if np.any(var >= mu_f * (1. - mu_f)):
                raise ValueError('var >= mu * (1. - mu)')
            nu = mu_f * (1. - mu_f) / var - 1.
            return np.random.beta(mu_f * nu, (1 - mu_f) * nu)

        if self.frac_beta_noise_stddev is not None:
            frac = add_beta_noise(genome_mixture.frac,
                                  self.frac_beta_noise_stddev ** 2.)
        else:
            frac = genome_mixture.frac

        h_pred = frac * self.h_total

        return Experiment(genome_mixture, h, phi, x, h_pred, **extra_params)
