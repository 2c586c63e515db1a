from . import schema, writers, quality, resume, dataset_writer, packed  # noqa: F401
