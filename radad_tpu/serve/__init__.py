from radad_tpu.serve.app import serve, load_pipeline  # noqa: F401
