"""Kernel ablation grid on the real TPU: one command, one JSON table.

Runs the E-step sweep benchmark under each combination of the kernel
tuning knobs (semiring matmul precision, grouped-kernel fix-up variant,
junction-slab buffer depth) in SEQUENTIAL subprocesses — the knobs are
read once at import, and the chip is single-tenant, so each config gets
its own short-lived process. Writes ``ABLATION.json`` at the repo root
and prints one line per config.

Usage (on the TPU host, no env needed):
    python tools/ablate_kernel.py [--quick]

Each subprocess pays its own compile (~2-4 min); the full default grid
is ~5 configs x ~6 min. A config whose subprocess fails (relay outage,
OOM) records an ``error`` entry instead of aborting the grid.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r'''
import json, sys
sys.path.insert(0, %(repo)r)
import bench
spec, params, state, data = bench.build_problem(bench.TPU_N, bench.TPU_EVENTS)
single = bench.time_single_sweep(spec, params, state)
batched = bench.time_restart_batched_sweep(spec, params, state,
                                           bench.NUM_RESTARTS)
parity = bench.pallas_parity(spec, params)
print('RESULT ' + json.dumps({
    'single_restart_segments_per_s': round(single, 1),
    'restart_batched_segments_per_s': round(batched, 1),
    'pallas_vs_scan': parity,
}))
'''

# (precision, fixup_vpu, grouped_slots, scaled_linear) — the first row is
# the shipped default and doubles as the baseline sanity check. 'high' is
# absent: Mosaic lowers only DEFAULT/HIGHEST dots, so inside the Pallas
# kernels HIGH is clamped to HIGHEST (ops/special.py MM_PRECISION_PALLAS)
# and would measure the same as the baseline here. grouped_slots now sets
# the junction-DMA pipeline depth (slabs in flight, VMEM-bounded).
GRID = [
    ('highest', '1', '2', '0'),
    ('highest', '1', '3', '0'),
    ('highest', '1', '4', '0'),
    ('default', '1', '2', '0'),
    ('highest', '1', '2', '1'),
]


def run_config(precision, fixup, slots, scaled, timeout_s, attempts=2):
    env = dict(os.environ)
    env['REMIXT_TPU_MM_PRECISION'] = precision
    env['REMIXT_TPU_FIXUP_VPU'] = fixup
    env['REMIXT_TPU_GROUPED_SLOTS'] = slots
    env['REMIXT_TPU_SCALED_LINEAR'] = scaled
    result = {'error': 'no attempts'}
    for attempt in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, '-c', PROBE % {'repo': REPO}],
                env=env, capture_output=True, text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            # the killed probe holds the chip claim for ~10 min; don't
            # retry into that window
            return {'error': 'timeout after %ds' % timeout_s}
        for line in proc.stdout.splitlines():
            if line.startswith('RESULT '):
                return json.loads(line[len('RESULT '):])
        result = {'error': 'rc=%d: %s' % (proc.returncode,
                                          proc.stderr.strip()[-500:])}
        # transient relay outages (UNAVAILABLE) deserve one more try;
        # real failures (OOM, Mosaic errors) do not
        if 'UNAVAILABLE' not in result['error']:
            return result
        print('  transient relay error; retrying config', flush=True)
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--quick', action='store_true',
                        help='only the first two configs (shipped default '
                             'vs log-space kernels)')
    parser.add_argument('--timeout', type=int, default=1500,
                        help='per-config subprocess timeout (s)')
    args = parser.parse_args()

    grid = GRID[:2] if args.quick else GRID
    results = []
    for precision, fixup, slots, scaled in grid:
        cfg = {'mm_precision': precision, 'fixup_vpu': fixup,
               'grouped_slots': slots, 'scaled_linear': scaled}
        print('running', cfg, flush=True)
        entry = dict(cfg)
        entry.update(run_config(precision, fixup, slots, scaled,
                                args.timeout))
        print(json.dumps(entry), flush=True)
        results.append(entry)

    out = os.path.join(REPO, 'ABLATION.json')
    with open(out, 'w') as f:
        json.dump(results, f, indent=2)
    print('wrote', out)


if __name__ == '__main__':
    main()
