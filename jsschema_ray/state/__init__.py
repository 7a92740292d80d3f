from jsschema_ray.state.hll import HyperLogLog
from jsschema_ray.state.tdigest import TDigest

__all__ = ["HyperLogLog", "TDigest"]
