"""``remixt-tpu write_results``: select the best solution and export TSV +
metadata YAML (reference ui/write_results.py:8-49)."""

import numpy as np
import yaml

from remixt_tpu.io.hdf5 import HDFStore


def write_results_tables(**args):
    with HDFStore(args['results_filename'], 'r') as store:
        stats = store['stats']

        # filter high proportion subclonal
        stats = stats[stats['proportion_divergent'] <= args['max_proportion_divergent']]

        # filter based on ploidy range
        if args.get('max_ploidy') is not None:
            stats = stats[stats['ploidy'] < args['max_ploidy']]
        if args.get('min_ploidy') is not None:
            stats = stats[stats['ploidy'] > args['min_ploidy']]

        if stats.empty:
            raise ValueError('filters to restrictive, no solutions')

        # highest elbo solution
        stats = stats.sort_values('elbo', ascending=False).iloc[0]
        solution = stats['init_id']

        cn = store['solutions/solution_{0}/cn'.format(solution)]
        brk_cn = store['solutions/solution_{0}/brk_cn'.format(solution)]
        h = store['solutions/solution_{0}/h'.format(solution)]
        mix = store['solutions/solution_{0}/mix'.format(solution)]

    cn.to_csv(args['cn_filename'], sep='\t', index=False)
    brk_cn.to_csv(args['brk_cn_filename'], sep='\t', index=False)

    metadata = dict()
    for key, value in stats.items():
        if isinstance(value, np.generic):
            metadata[key] = value.item()
        else:
            metadata[key] = value
    metadata['h'] = list(h.tolist())
    metadata['mix'] = list(mix.tolist())

    with open(args['meta_filename'], 'w') as f:
        yaml.dump(metadata, f, default_flow_style=False)


def add_arguments(argparser):
    argparser.add_argument('results_filename',
        help='Results filename')

    argparser.add_argument('cn_filename',
        help='Output segment copy number table filename')

    argparser.add_argument('brk_cn_filename',
        help='Output breakpoint copy number table filename')

    argparser.add_argument('meta_filename',
        help='Output meta data filename')

    argparser.add_argument('--max_ploidy', type=float, default=None,
        help='Maximum ploidy')

    argparser.add_argument('--min_ploidy', type=float, default=None,
        help='Minimum ploidy')

    argparser.add_argument('--max_proportion_divergent', type=float, default=0.5,
        help='Maximum proportion of the genome divergent')

    argparser.set_defaults(func=write_results_tables)
