"""Durable-state layer: checkpoint manifests (resume) and broadcast dims."""

from .manifest import run_with_manifest, completed_parts  # noqa: F401
from .broadcast import broadcast, BroadcastLookup  # noqa: F401
