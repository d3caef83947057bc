from super_tpu.ops.knn import knn, masked_knn, class_masked_knn  # noqa: F401
from super_tpu.ops.bilinear import bilinear_sample_indexed  # noqa: F401
from super_tpu.ops.morphology import dilate, erode, find_edge_region  # noqa: F401
from super_tpu.ops.ssim import ssim  # noqa: F401
