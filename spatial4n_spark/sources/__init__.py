from spatial4n_spark.sources.images import images_df, decode_image_batch, IMAGES_SCHEMA
from spatial4n_spark.sources.polygons import polygon_layer, polygon_layer_df

__all__ = ["images_df", "decode_image_batch", "IMAGES_SCHEMA", "polygon_layer", "polygon_layer_df"]
