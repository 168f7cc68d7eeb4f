"""ctypes binding for the native BAM allele reader.

API parity with the reference Cython binding (/root/reference/remixt/
bamreader.pyx:36-79): ``AlleleReader(bam, snps, chrom, max_fragment_length,
max_soft_clipped, check_proper_pair)`` with ``ReadAlignments(n)`` /
``GetFragmentTable()`` / ``GetAlleleTable()`` returning pandas DataFrames.

The shared library (src/bam_allele_reader.cpp) is built on demand with g++
against zlib; no htslib/bamtools/pybind11 dependency.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np
import pandas as pd

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'src', 'bam_allele_reader.cpp')
_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), '_native')
_LIB = os.path.join(_LIB_DIR, 'libbamallele.so')

_lock = threading.Lock()
_lib = None


def _build_library():
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ['g++', '-O2', '-std=c++17', '-shared', '-fPIC',
           _SRC, '-o', _LIB, '-lz']
    subprocess.check_call(cmd)


def _load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build_library()
        lib = ctypes.CDLL(_LIB)

        lib.allele_reader_create.restype = ctypes.c_void_p
        lib.allele_reader_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.allele_reader_destroy.argtypes = [ctypes.c_void_p]
        lib.allele_reader_read_alignments.restype = ctypes.c_int
        lib.allele_reader_read_alignments.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.allele_reader_num_fragments.restype = ctypes.c_long
        lib.allele_reader_num_fragments.argtypes = [ctypes.c_void_p]
        lib.allele_reader_num_alleles.restype = ctypes.c_long
        lib.allele_reader_num_alleles.argtypes = [ctypes.c_void_p]
        lib.allele_reader_get_fragments.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
        lib.allele_reader_get_alleles.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
        lib.allele_reader_last_error.restype = ctypes.c_char_p

        _lib = lib
        return _lib


class AlleleReader(object):
    """Stream one chromosome's fragments and SNP allele calls from a BAM."""

    def __init__(self, bam_filename, snp_filename, chromosome,
                 max_fragment_length, max_soft_clipped, check_proper_pair):
        self._lib = _load_library()
        self._reader = self._lib.allele_reader_create(
            str(bam_filename).encode(),
            str(snp_filename).encode() if snp_filename else b'',
            str(chromosome).encode(),
            int(max_fragment_length),
            int(max_soft_clipped),
            int(bool(check_proper_pair)))
        if not self._reader:
            raise IOError(self._lib.allele_reader_last_error().decode())

    def __del__(self):
        if getattr(self, '_reader', None):
            self._lib.allele_reader_destroy(self._reader)
            self._reader = None

    def ReadAlignments(self, max_alignments):
        """Process up to max_alignments records; True while data remains."""
        result = self._lib.allele_reader_read_alignments(
            self._reader, int(max_alignments))
        if result < 0:
            raise IOError(self._lib.allele_reader_last_error().decode())
        return bool(result)

    def GetFragmentTable(self):
        n = self._lib.allele_reader_num_fragments(self._reader)
        buf = np.zeros((n, 5), dtype=np.int32)
        if n:
            self._lib.allele_reader_get_fragments(
                self._reader, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return pd.DataFrame({
            'fragment_id': buf[:, 0],
            'start': buf[:, 1],
            'end': buf[:, 2],
            'mapping_quality': buf[:, 3],
            'is_duplicate': buf[:, 4],
        })

    def GetAlleleTable(self):
        n = self._lib.allele_reader_num_alleles(self._reader)
        buf = np.zeros((n, 3), dtype=np.int32)
        if n:
            self._lib.allele_reader_get_alleles(
                self._reader, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return pd.DataFrame({
            'fragment_id': buf[:, 0],
            'position': buf[:, 1],
            'is_alt': buf[:, 2],
        })
