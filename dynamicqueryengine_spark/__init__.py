"""dynamicqueryengine_spark — a PySpark-native rule/query engine.

Brand-new implementation of the query and data-processing capabilities of
murat-boz/DynamicQueryEngine (reference analyzed in SURVEY.md), re-expressed
Spark-first: rule-JSON documents compile to Catalyst ``Column`` expressions,
aggregation uses single-pass ``min_by``/``max_by``/``count``, multi-rule
batches become union-distinct plans — and Catalyst/Tungsten supply the
optimizer and execution engine the reference never had.

Beyond reference parity, ``functions/`` adds large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) and ``streaming/`` runs the same compiled rules over Structured
Streaming sources.
"""

from .errors import (
    RuleCompilationError,
    RuleEngineError,
    RuleValidationError,
    UnsupportedOperatorError,
)
from .operators.aggregate import apply_aggregation
from .operators.executor import apply_rule, execute_rules, register_rule_view
from .operators.predicates import PredicateCompiler, compile_predicate
from .operators.registry import (
    CustomOperator,
    lookup_operator,
    register_operator,
    registered_operators,
    unregister_operator,
)
from .plans.model import (
    AggregateFunction,
    AggregationDefinition,
    Condition,
    ConditionGroup,
    RuleDefinition,
)
from .plans.sqlgen import SqlGenerator
from .plans.validate import validate, validate_rule
from .session import get_spark
from .sources.registry import DEFAULT_TABLES, TableRegistry, inline_table

__all__ = [
    "AggregateFunction",
    "AggregationDefinition",
    "Condition",
    "ConditionGroup",
    "CustomOperator",
    "DEFAULT_TABLES",
    "PredicateCompiler",
    "RuleCompilationError",
    "RuleDefinition",
    "RuleEngineError",
    "RuleValidationError",
    "SqlGenerator",
    "TableRegistry",
    "UnsupportedOperatorError",
    "apply_aggregation",
    "apply_rule",
    "compile_predicate",
    "execute_rules",
    "lookup_operator",
    "register_operator",
    "register_rule_view",
    "registered_operators",
    "unregister_operator",
    "get_spark",
    "inline_table",
    "validate",
    "validate_rule",
]

__version__ = "0.1.0"
