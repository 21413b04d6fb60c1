"""Core shift-and-stack psi/phi generation (pure functions).

API-compatible with the reference's kbmod.core.shift_and_stack
(src/kbmod/core/shift_and_stack.py:8-93); the convolution runs on device via
kbmod_tpu.ops.psi_phi.
"""

from kbmod_tpu.ops.psi_phi import (
    generate_psi_phi_images,
    generate_all_psi_phi_images,
    generate_psi_phi_from_image_stack,
)

__all__ = [
    "generate_psi_phi_images",
    "generate_all_psi_phi_images",
    "generate_psi_phi_from_image_stack",
]
