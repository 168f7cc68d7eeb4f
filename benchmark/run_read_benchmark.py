"""Read-simulation accuracy benchmark.

Mirrors /root/reference/benchmark/run_read_benchmark.py — like the
resample benchmark but with fully simulated reads (fragment sampling on
the rearranged genomes + germline haplotype recombination) instead of
resampled real reads, so no source BAM-derived seqdata is needed.

Usage:
    python benchmark/run_read_benchmark.py <ref_data_dir> <sim_defs.yaml>
        <raw_data_dir> <table> [--tools remixt] [--config CONFIG]
"""

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import remixt_tpu.simulations.pipeline
import remixt_tpu.simulations.workflow
import remixt_tpu.wrappers
from remixt_tpu.scheduler import Workflow


def main():
    argparser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)

    argparser.add_argument('ref_data_dir', help='Reference dataset directory')
    argparser.add_argument('sim_defs', help='Simulation definition filename')
    argparser.add_argument('raw_data_dir', help='Raw data directory')
    argparser.add_argument('table', help='Output table filename')
    argparser.add_argument('--tools', nargs='+', default=['remixt'],
                           choices=list(remixt_tpu.wrappers.catalog.keys()))
    argparser.add_argument('--config', required=False)
    argparser.add_argument('--maxjobs', type=int, default=1)

    args = vars(argparser.parse_args())

    config = {}
    if args['config'] is not None:
        config = yaml.safe_load(open(args['config']))

    sim_defs = remixt_tpu.simulations.pipeline.create_simulations(
        args['sim_defs'], config, args['ref_data_dir'])

    os.makedirs(args['raw_data_dir'], exist_ok=True)

    workflow = Workflow('read_benchmark')

    evaluation_files = {}
    for sim_id, params in sim_defs.items():
        sim_dir = os.path.join(args['raw_data_dir'], sim_id)
        os.makedirs(sim_dir, exist_ok=True)

        normal_file = os.path.join(sim_dir, 'normal.h5')
        tumour_file = os.path.join(sim_dir, 'tumour.h5')
        mixture_file = os.path.join(sim_dir, 'mixture.pickle')
        breakpoints_file = os.path.join(sim_dir, 'breakpoints.tsv')

        workflow.subworkflow(
            'simulate_{}'.format(sim_id),
            remixt_tpu.simulations.workflow.create_read_simulation_workflow(
                params, normal_file, tumour_file, mixture_file,
                breakpoints_file, config, args['ref_data_dir'],
                os.path.join(sim_dir, 'sim')))

        for tool_name in args['tools']:
            tool = remixt_tpu.wrappers.catalog[tool_name](
                config, args['ref_data_dir'])
            results_file = os.path.join(
                sim_dir, 'results_{}.h5'.format(tool_name))
            evaluation_file = os.path.join(
                sim_dir, 'evaluation_{}.h5'.format(tool_name))
            evaluation_files[(sim_id, tool_name)] = evaluation_file

            workflow.subworkflow(
                'run_{}_{}'.format(tool_name, sim_id),
                tool.create_workflow(
                    {'normal': normal_file, 'tumour': tumour_file},
                    breakpoints_file, results_file,
                    os.path.join(sim_dir, tool_name), normal_id='normal'))

            workflow.transform(
                'evaluate_{}_{}'.format(tool_name, sim_id),
                remixt_tpu.simulations.pipeline.evaluate_results_task,
                args=(evaluation_file, results_file),
                kwargs={'mixture_filename': mixture_file},
                inputs=[results_file, mixture_file],
                outputs=[evaluation_file],
            )

    workflow.transform(
        'merge_evaluations',
        remixt_tpu.simulations.pipeline.merge_evaluations,
        args=(args['table'], sim_defs, evaluation_files,
              ['sim_id', 'tool']),
        inputs=list(evaluation_files.values()),
        outputs=[args['table']],
    )

    workflow.run(os.path.join(args['raw_data_dir'], 'work'),
                 max_jobs=args['maxjobs'])


if __name__ == '__main__':
    main()
