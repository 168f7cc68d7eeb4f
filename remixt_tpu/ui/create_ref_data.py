"""``remixt-tpu create_ref_data``: download and build the reference dataset
(reference ui/create_ref_data.py:8-18)."""

import os

import yaml

import remixt_tpu.ref_data


def run(**args):
    ref_data_dir = args['ref_data_dir']

    config = {}
    if args['config'] is not None:
        config = yaml.safe_load(open(args['config']))

    ref_data_sentinal = os.path.join(ref_data_dir, 'sentinal')

    remixt_tpu.ref_data.create_ref_data(
        config, ref_data_dir, ref_data_sentinal,
        bwa_index_genome=args['bwa_index_genome'])


def add_arguments(argparser):
    argparser.add_argument('ref_data_dir',
        help='Reference dataset directory')

    argparser.add_argument('-c', '--config',
        help='Configuration filename')

    argparser.add_argument('-b', '--bwa_index_genome',
        action='store_true',
        help='Index the genome for bwa, used for tests/benchmarking')

    argparser.set_defaults(func=run)
