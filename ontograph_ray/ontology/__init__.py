from .graph import (  # noqa: F401
    OntologyAlreadyExistsError,
    OntologyGraph,
    OntologyNotFoundError,
    TripleFilter,
)
from .query import get_individuals_dataset, candidate_subjects  # noqa: F401
from .resources import (  # noqa: F401
    OntologyClass,
    OntologyDataProperty,
    OntologyDatatype,
    OntologyIndividual,
    OntologyObjectProperty,
    OntologyResource,
    ResourceDoesNotBelongToGraphError,
    ResourceNotFoundError,
    pivot_class,
    pivot_data_property,
    pivot_datatype,
    pivot_individual,
    pivot_object_property,
)
