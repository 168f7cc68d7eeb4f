"""Analysis / data-prep layer: segments, read counts, GC bias, read-depth
initialization, haplotypes, breakpoints, experiment assembly, fit pipeline."""
