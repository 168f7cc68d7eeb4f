"""Inference core: copy-number state enumeration, the variational HMM engine
(JAX), EM drivers, and the float64 numpy oracle used as the numerical spec.
"""
