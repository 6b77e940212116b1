from nsfnet_tpu.data.cavity import CavityData
from nsfnet_tpu.data.sampling import latin_hypercube, sort_by_boundary_distance

__all__ = ["CavityData", "latin_hypercube", "sort_by_boundary_distance"]
