"""Pure-array ops: resize/coordinate math, metrics, mask geometry, morphology,
connected components, NMS, RLE, random-walk Laplacians.  Everything here is
jittable unless explicitly documented as host-side."""
