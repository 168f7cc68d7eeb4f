"""Benchmark wrapper for this framework itself (reference
wrappers/wrapremixt.py equivalent): seqdata → counts → fit → results.
"""

import os

import remixt_tpu.workflow


class ReMixTTool(object):
    def __init__(self, config, ref_data_dir):
        self.config = config
        self.ref_data_dir = ref_data_dir

    def create_workflow(self, seqdata_filenames, breakpoints_filename,
                        results_filename, workdir, normal_id=None):
        os.makedirs(workdir, exist_ok=True)
        tumour_ids = [k for k in seqdata_filenames if k != normal_id]
        results_filenames = {tid: results_filename for tid in tumour_ids}
        return remixt_tpu.workflow.create_remixt_seqdata_workflow(
            breakpoints_filename,
            seqdata_filenames,
            results_filenames,
            workdir,
            self.config,
            self.ref_data_dir,
            normal_id=normal_id,
        )
