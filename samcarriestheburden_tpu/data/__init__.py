"""Host-side data layer: CVAT annotation parsing, datasets, HDF5 artifact
conventions (identical schemas to the reference so artifacts interoperate)."""
