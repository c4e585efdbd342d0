from laion_spark.plans.concept import (
    ConceptParseError,
    compile_concept,
    eval_concept,
    parse_concept,
)

__all__ = ["ConceptParseError", "compile_concept", "eval_concept", "parse_concept"]
