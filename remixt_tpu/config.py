"""Layered configuration access.

Semantics match the reference (/root/reference/remixt/config.py:5-59): module
defaults overlaid by a user-supplied YAML dict, filename template expansion
against the full config plus ``ref_data_dir``, and per-sample overrides under
the ``sample_specific`` key.
"""

import remixt_tpu.defaults
import remixt_tpu.utils


def get_full_config(config):
    full_config = {
        k: v for k, v in vars(remixt_tpu.defaults).items()
        if not k.startswith('_')
    }
    full_config.update(config)
    return full_config


def get_param(config, name):
    return get_full_config(config)[name]


def get_filename(config, ref_data_dir, name, **kwargs):
    full_config = get_full_config(config)
    full_config.update(kwargs)
    full_config['ref_data_dir'] = ref_data_dir
    if name + '_filename' in full_config:
        return full_config[name + '_filename']
    elif name + '_template' in full_config:
        return full_config[name + '_template'].format(**full_config)


def get_chromosome_lengths(config, ref_data_dir):
    genome_fai = get_filename(config, ref_data_dir, 'genome_fai')
    chromosome_lengths = remixt_tpu.utils.read_chromosome_lengths(genome_fai)

    chromosomes = set(get_param(config, 'chromosomes'))

    assert chromosomes.issubset(set(chromosome_lengths.keys()))

    chr_name_prefix = get_param(config, 'chr_name_prefix')
    if chr_name_prefix == 'chr':
        assert all(c.startswith('chr') for c in chromosomes)
    elif chr_name_prefix == '':
        assert not any(c.startswith('chr') for c in chromosomes)
    else:
        raise ValueError(f'unrecognized chr_name_prefix {chr_name_prefix}')

    return {
        chrom: length for chrom, length in chromosome_lengths.items()
        if chrom in chromosomes
    }


def get_chromosomes(config, ref_data_dir):
    return list(get_chromosome_lengths(config, ref_data_dir).keys())


def get_sample_config(config, sample_id):
    sample_config = config.copy()
    sample_config.update(config.get('sample_specific', dict()).get(sample_id, dict()))
    return sample_config
