from kbmod_tpu.core.psf import PSF, convolve_psf_and_image
from kbmod_tpu.core.image_stack_py import ImageStackPy, LayeredImagePy

__all__ = ["PSF", "convolve_psf_and_image", "ImageStackPy", "LayeredImagePy"]
