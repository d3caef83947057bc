"""Pallas TPU kernels for the hot ops."""

from super_tpu.pallas_kernels.gram import tuple_gram_pallas  # noqa: F401
