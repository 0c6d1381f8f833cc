"""Model conversion / inspection tooling (the gguf-py + convert_hf_to_gguf
analogues)."""
