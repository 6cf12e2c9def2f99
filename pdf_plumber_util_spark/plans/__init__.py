from .extract import extract_lines, extract_documents, doc_stats  # noqa: F401
from .resume import (  # noqa: F401
    committed_partitions,
    delete_dir,
    publish_bucket,
    resume_filter,
    run_resumable,
)
from .curate import curate_corpus  # noqa: F401
