from genie2_tpu.ops.triangle import (
    triangle_multiply,
    triangle_multiply_reference,
)

__all__ = [
    "triangle_multiply",
    "triangle_multiply_reference",
]
