"""clip shim — CLIP_AVE.py only calls clip.load() when pretrained is a str;
the parity tests construct with pretrained=None."""


def load(*args, **kwargs):  # pragma: no cover
    raise RuntimeError("clip.load is unavailable in the test image")
