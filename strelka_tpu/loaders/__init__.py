from strelka_tpu.loaders.gltf import GltfLoader  # noqa: F401
