from jsschema_ray.sources.synth import synth_image_table, write_image_dataset

__all__ = ["synth_image_table", "write_image_dataset"]
