"""ipdb shim — the reference imports `from ipdb import set_trace` but never
calls it on the paths we exercise."""


def set_trace(*args, **kwargs):  # pragma: no cover
    raise RuntimeError("ipdb.set_trace called from reference code under test")
