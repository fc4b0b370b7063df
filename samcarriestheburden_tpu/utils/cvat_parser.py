"""Shim for the reference's ``utils.cvat_parser``."""
from samcarriestheburden_tpu.data.cvat import CVATParser, Mask  # noqa: F401
