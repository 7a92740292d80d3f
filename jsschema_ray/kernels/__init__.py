from jsschema_ray.kernels.json_eval import evaluate, validate_value

__all__ = ["evaluate", "validate_value"]
