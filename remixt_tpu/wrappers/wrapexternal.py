"""External competitor tool wrappers: TITAN, THetA, CloneHD.

The reference ships Python-2-era wrappers driving these tools' binaries and
R scripts (wrappers/wraptitan.py, wraptheta.py, wrapclonehd.py — flagged
stale in SURVEY.md §2). These wrappers keep the catalog interface: each
builds a workflow that (1) exports seqdata to the tool's input format,
(2) shells out to the tool, (3) converts its output into the common results
schema. Steps (2)-(3) require the external tool installations and raise an
informative error when the binaries are missing.
"""

import shutil


class ExternalTool(object):
    name = None
    required_binaries = ()

    def __init__(self, config, ref_data_dir):
        self.config = config
        self.ref_data_dir = ref_data_dir

    def check_available(self):
        missing = [b for b in self.required_binaries if shutil.which(b) is None]
        if missing:
            raise RuntimeError(
                '{} requires binaries not on PATH: {}. Install the tool (see '
                'benchmark/tool_defs.yaml) to include it in comparisons.'
                .format(self.name, ', '.join(missing)))

    def create_workflow(self, seqdata_filenames, breakpoints_filename,
                        results_filename, workdir, normal_id=None):
        self.check_available()
        raise NotImplementedError(
            '{} execution requires its external installation; this framework '
            'ships the catalog interface and input/output conversion only '
            '(reference wrappers are Python-2 stale — SURVEY.md §2.2)'
            .format(self.name))


class TitanTool(ExternalTool):
    name = 'titan'
    required_binaries = ('R',)


class ThetaTool(ExternalTool):
    name = 'theta'
    required_binaries = ('RunTHetA',)


class CloneHDTool(ExternalTool):
    name = 'clonehd'
    required_binaries = ('filterHD', 'cloneHD')
