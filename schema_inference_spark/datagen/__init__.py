from schema_inference_spark.datagen.images import generate_image_corpus, images_spark_df  # noqa: F401
