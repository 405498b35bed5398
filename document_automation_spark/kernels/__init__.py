"""Pure deterministic kernels — NO Spark imports allowed in this subpackage.

These functions ARE the byte-identical contract: the Spark extraction job
(``operators.extract``) and the pytest pure-Python oracle both call them, so
per-url extracted text matches byte-for-byte by construction, and the unit
tests pin every quirk of the reference semantics so a regression in either
caller is caught.
"""

from document_automation_spark.kernels.textproc import (  # noqa: F401
    AD_MARKERS,
    DEFAULT_MAX_LEN,
    DEFAULT_MIN_CHARS,
    DEFAULT_OVERLAP,
    Passage,
    assemble_lines,
    contains_ad,
    extract_document,
    join_clean_lines,
    link_from_url,
    split_passages,
)
from document_automation_spark.kernels.html_extract import (  # noqa: F401
    extract_main_text_html,
)
from document_automation_spark.kernels.html_fast import (  # noqa: F401
    extract_main_text_html_fast,
)
from document_automation_spark.kernels.pdf_extract import (  # noqa: F401
    extract_text_pdf,
    looks_like_pdf,
)
