"""``remixt-tpu`` console entry point.

Subcommand dispatcher mirroring the reference CLI
(/root/reference/remixt/ui/main.py:15-20): run, create_ref_data,
mappability_bwa, write_results, plot_results, visualize_solutions — plus
``fit`` (count-table to results without BAM preprocessing, the minimum
end-to-end slice).
"""

import argparse

import remixt_tpu.ui.run
import remixt_tpu.ui.fit
import remixt_tpu.ui.create_ref_data
import remixt_tpu.ui.mappability_bwa
import remixt_tpu.ui.write_results
import remixt_tpu.ui.plot_results
import remixt_tpu.ui.visualize_solutions


def main():
    argparser = argparse.ArgumentParser(prog='remixt-tpu')
    subparsers = argparser.add_subparsers(required=True)

    modules = {
        'run': remixt_tpu.ui.run,
        'fit': remixt_tpu.ui.fit,
        'create_ref_data': remixt_tpu.ui.create_ref_data,
        'mappability_bwa': remixt_tpu.ui.mappability_bwa,
        'write_results': remixt_tpu.ui.write_results,
        'plot_results': remixt_tpu.ui.plot_results,
        'visualize_solutions': remixt_tpu.ui.visualize_solutions,
    }

    for name, module in modules.items():
        subparser = subparsers.add_parser(name)
        module.add_arguments(subparser)

    args = vars(argparser.parse_args())
    func = args.pop('func')

    # compiled-program reuse across CLI invocations (subcommand configs
    # can still override/disable through the standard overlay)
    from remixt_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    func(**args)


if __name__ == '__main__':
    main()
