"""Inference / refinement engine: predictor, decoder head over precomputed
embeddings, automatic mask generation, prompt extraction, refinement."""
