from .extract import extract_lines, extract_documents, doc_stats  # noqa: F401
from .resume import (  # noqa: F401
    write_partitioned,
    committed_partitions,
    resume_filter,
    run_resumable,
)
