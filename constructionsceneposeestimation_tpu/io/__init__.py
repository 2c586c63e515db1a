from . import schema, writers, quality, resume, dataset_writer  # noqa: F401
