from .manifest import BucketManifest, read_manifests, write_manifest  # noqa: F401
