from torch_m3gnet_tpu.ops.basis import (
    chi_norm_constants,
    cutoff_poly,
    legendre_cos_all,
    normalized_spherical_bessel,
    reference_literal_chi_norm,
    smooth_radial_basis,
    spherical_bessel_all,
    spherical_bessel_zeros,
)
from torch_m3gnet_tpu.ops.segment import segment_sum

__all__ = [
    "chi_norm_constants",
    "cutoff_poly",
    "legendre_cos_all",
    "normalized_spherical_bessel",
    "reference_literal_chi_norm",
    "smooth_radial_basis",
    "spherical_bessel_all",
    "spherical_bessel_zeros",
    "segment_sum",
]
