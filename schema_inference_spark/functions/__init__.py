from schema_inference_spark.functions.type_inference import (  # noqa: F401
    JSON_TYPE_FOR,
    infer_type_expr,
    infer_type_sql,
    merge_type,
    merge_schemas,
)
from schema_inference_spark.functions.json_shape import (  # noqa: F401
    flat_json_shape_expr,
    flat_json_shape_sql,
    json_shape_of,
)
