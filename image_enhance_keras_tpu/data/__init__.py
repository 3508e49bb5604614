from image_enhance_keras_tpu.data.io import imread, imwrite, list_images  # noqa: F401
