"""Engine configuration.

Chunking parameters mirror the reference's settings surface
(reference: config/settings.py:68-91 — the CLI-canonical values — and
domain/parsers/lovdata_chunker.py:38-57 for library defaults; see
SURVEY.md §2.1 for the mismatch note).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ChunkParams:
    """Token-budget parameters driving split/merge decisions."""

    target_tokens: int = 2000  # settings.py:74-79 (CLI canonical; library dflt 768)
    max_tokens: int = 6800  # settings.py:68-73 (library dflt 8191)
    min_tokens: int = 300  # settings.py:80-85
    overlap_ratio: float = 0.15  # settings.py:86-91

    @property
    def overlap_count(self) -> int:
        # Sentence-overlap step used by the oversize splitter
        # (lovdata_chunker.py:43,57: overlap = int(target * ratio)).
        return int(self.target_tokens * self.overlap_ratio)


@dataclass(frozen=True)
class PipelineConfig:
    """Run-level options (reference: config/settings.py + cli.py:32-115)."""

    dataset_pattern: str = "*"  # settings.py:94-97 wildcard dataset filter
    force: bool = False  # cli.py:34 bypass change detection
    limit: int | None = None  # settings.py:102-105 head-n for testing
    embed_batch_size: int = 100  # pipeline_orchestrator.py:107
    embedding_model: str = "mock-hash-embedder"
    embedding_dims: int = 64  # settings default is 1024; tests use small dims
    chunk: ChunkParams = field(default_factory=ChunkParams)
