"""Model export: StableHLO serialisation of the decoder head (the TPU-native
equivalent of the reference's ONNX export)."""
