from qin_cdc_spark.cdc.envelope import ENVELOPE_SCHEMA, envelope_from_typed  # noqa: F401
from qin_cdc_spark.cdc.apply import latest_by_key, apply_changes, decode_envelope  # noqa: F401
