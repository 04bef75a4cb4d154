from . import nthash, nthash_ref, u64  # noqa: F401
