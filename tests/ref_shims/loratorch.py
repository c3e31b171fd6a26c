"""loratorch shim — imported by CLIP_AVE.py as `lora` but never referenced."""
