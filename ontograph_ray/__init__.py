"""ontograph_ray — a Ray-Data-native knowledge-graph construction and
triple-store engine.

Re-expresses the capabilities of the reference ontograph library
(term/triple model, GraphStore CRUD + pattern matching, OWL ontology
layer, Turtle round-trip) as Arrow-columnar operators over
``ray.data.Dataset`` pipelines, plus the web-scale KG-construction
pipeline (text extraction → mention detection → relation extraction →
entity linking → sameAs canonicalization → deduplicated N-Triples
materialization) and large-scale training-data utilities (dedup,
similarity search, text analysis).
"""

from . import constants  # noqa: F401
from .literals import (  # noqa: F401
    GenericLiteral,
    LiteralTypeMismatchError,
    xsd_any_uri,
    xsd_boolean,
    xsd_datetime,
    xsd_decimal,
    xsd_integer,
    xsd_string,
)
from .terms import (  # noqa: F401
    is_literal,
    is_resource,
    new_literal_term,
    new_resource_term,
    term_datatype,
    term_language,
    term_value,
)
from .triples import (  # noqa: F401
    COLUMNS,
    TRIPLE_SCHEMA,
    InvalidTripleError,
    Triple,
    new_triple,
)

__version__ = "0.1.0"
