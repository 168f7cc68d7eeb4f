"""Restart-axis scaling probe for the grouped batched sweep (real TPU).

Times the restart-batched VI sweep at several R values and prints
aggregate segments/s plus per-step cost relative to R=1, answering how
the grouped kernel's per-step cost grows with the restart axis (lanes
RQp, junction slab size, fix-up width all scale with R).  Findings feed
kernel work: an aggregate curve that stays below the single-restart
sweep means the batched path is not yet MXU-bound at production shape.

Usage (on the TPU host):
    python tools/probe_restart_scaling.py [R ...]   # default 1 2 4 8 12
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main():
    rs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 12, 16, 24]
    spec, params, state, _ = bench.build_problem(bench.TPU_N, bench.TPU_EVENTS)
    single = bench.time_single_sweep(spec, params, state)
    rows = [{'R': 0, 'note': 'single-restart sweep (non-grouped kernel)',
             'segments_per_s': round(single, 1)}]
    print(json.dumps(rows[0]), flush=True)
    base_r = rs[0]
    base_step_s = None
    best = (0.0, None)
    for r in rs:
        try:
            # probe the grouped kernel at every extent (the production
            # shape guard would otherwise route non-wave extents to the
            # tiled kernel — this tool exists to characterize grouped)
            spec.pallas_grouped_wave = r
            agg = bench.time_restart_batched_sweep(spec, params, state, r)
        except Exception as exc:  # VMEM OOM past the kernel's lane budget
            note = 'vmem_oom' if 'vmem' in str(exc).lower() else 'failed'
            row = {'R': r, 'note': note, 'error': str(exc).split('\n')[0][:200]}
            rows.append(row)
            print(json.dumps(row), flush=True)
            continue
        # Aggregate throughput counts R x N segments per sweep, so r/agg is
        # proportional to the wall-clock cost of one grid step.
        step_s = r / agg
        if base_step_s is None:
            base_step_s = step_s
        row = {'R': r, 'segments_per_s': round(agg, 1),
               'per_restart_segments_per_s': round(agg / r, 1),
               f'step_cost_vs_R{base_r}': round(step_s / base_step_s, 2)}
        rows.append(row)
        best = max(best, (agg, r))
        print(json.dumps(row), flush=True)
    rows.append({'optimal_wave_R': best[1],
                 'note': 'aggregate-throughput-optimal restart wave; '
                         'fit_batched chunks the grid at this size '
                         '(defaults.restart_chunk_size)'})
    out = os.path.join(REPO, 'RESTART_SCALING.json')
    with open(out, 'w') as f:
        json.dump(rows, f, indent=2)
    print('wrote', out)


if __name__ == '__main__':
    main()
