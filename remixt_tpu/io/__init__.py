"""IO layer: HDF5 results/seqdata stores and the native BAM reader binding."""
