"""Export a merged evaluation store to a readable checked-in JSON.

Usage: python benchmark/export_evaluation.py <merged.h5> <out.json>
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remixt_tpu.io.hdf5 import HDFStore


def main():
    store_filename, out_filename = sys.argv[1], sys.argv[2]

    out = {}
    with HDFStore(store_filename, 'r') as store:
        for key in ('/cn_evaluation', '/brk_cn_evaluation', '/mix_results',
                    '/outlier_evaluation', '/simulations'):
            if key not in store.keys():
                continue
            table = store[key]
            records = table.to_dict(orient='records')
            out[key.lstrip('/')] = [
                {k: (v.item() if isinstance(v, np.generic) else v)
                 for k, v in row.items()} for row in records]

    with open(out_filename, 'w') as f:
        json.dump(out, f, indent=2, default=str)
    print('wrote', out_filename)


if __name__ == '__main__':
    sys.exit(main())
