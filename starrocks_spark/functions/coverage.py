"""Scalar-function coverage ledger vs the reference registry.

The reference's vectorized function registry
(gensrc/script/functions.py) declares ~394 distinct scalar names. This
module classifies EVERY one of them for the parity checklist
(SURVEY.md §2.10):

- ``identical``:  the exact name is a PySpark builtin (computed, not
                  hand-listed — kept honest by the test).
- ``MAPPED``:     different name, direct Spark builtin / one-line
                  expression equivalent (the ledger records it).
- ``REPO``:       implemented by a module in this repo.
- ``NA``:         out of the data plane (server/session introspection,
                  storage-internal encodings, connector intrinsics) or
                  digest algorithms absent from the JVM; each carries
                  its reason.

``python -m starrocks_spark.functions.coverage`` regenerates
FUNCTIONS.md; tests/test_scalar_functions.py asserts the ledger is
total (every reference name classified exactly once) against the
snapshot below.
"""

from __future__ import annotations

# Snapshot of the reference registry's distinct scalar names
# (gensrc/script/functions.py, reference @ 2026-08). The test re-derives
# this list from the reference checkout when present.
REFERENCE_NAMES = """
__iceberg_transform_bucket __iceberg_transform_day __iceberg_transform_hour
__iceberg_transform_month __iceberg_transform_timestamptz_bucket
__iceberg_transform_timestamptz_day __iceberg_transform_timestamptz_hour
__iceberg_transform_timestamptz_month __iceberg_transform_timestamptz_year
__iceberg_transform_truncate __iceberg_transform_year abs acos add
add_months adddate aes_decrypt aes_encrypt ai_query all_match any_match
append_trailing_char_if_absent approx_cosine_similarity approx_l2_distance
array_append array_avg array_concat array_contains array_contains_all
array_contains_seq array_cum_sum array_difference array_distinct
array_filter array_flatten array_generate array_intersect array_join
array_length array_map array_max array_min array_position array_remove
array_repeat array_slice array_sort array_sort_lambda array_sortby
array_sum array_to_bitmap array_top_n arrays_overlap arrays_zip ascii
asin assert_true atan atan2 bar base64_decode_binary base64_decode_string
base64_to_bitmap bin bit_shift_left bit_shift_right
bit_shift_right_logical bitand bitmap_and bitmap_andnot bitmap_contains
bitmap_count bitmap_empty bitmap_from_binary bitmap_from_string
bitmap_has_any bitmap_hash bitmap_hash64 bitmap_max bitmap_min bitmap_or
bitmap_remove bitmap_subset_in_range bitmap_subset_limit bitmap_to_array
bitmap_to_base64 bitmap_to_binary bitmap_to_string bitmap_xor bitnot
bitor bitxor blake3 cardinality cbrt ceil ceiling char char_length
character_length coalesce concat concat_ws conv convert_tz cos cosh
cosine_similarity cosine_similarity_norm cot crc32 crc32_hash curdate
current_date current_time current_timestamp current_timezone
current_version curtime date date_add date_diff date_format date_slice
date_sub date_trunc datediff day dayname dayofmonth dayofweek
dayofweek_iso dayofyear days_add days_diff days_sub dceil degrees dexp
dfloor dict_encode distinct_map_keys dlog1 dlog10 dpow dround dsqrt e
encode_fingerprint_sha256 encode_sort_key ends_with equiwidth_bucket
esquery exp field find_in_set floor fmod format_bytes fpow from_base64
from_binary from_days from_unixtime from_unixtime_ms get_json_bool
get_json_double get_json_int get_json_object get_json_scalar
get_json_string get_query_profile get_variant_bool get_variant_date
get_variant_datetime get_variant_double get_variant_int
get_variant_string get_variant_time greatest grouping grouping_id hex
hex_decode_binary hex_decode_string hll_cardinality hll_deserialize
hll_empty hll_hash hll_serialize host_name hour hour_from_unixtime
hours_add hours_diff hours_sub http_request if ifnull inet_aton initcap
instr is_json_scalar is_role_in_session jodatime_format json_array
json_contains json_exists json_keys json_length json_object json_pretty
json_query json_remove json_set json_string json_value l2_distance
last_day last_query_id lcase least left length ln localtime
localtimestamp locate log log10 log2 lower lpad ltrim ltrim_string
makedate map_apply map_concat map_entries map_filter map_from_arrays
map_keys map_size map_values materialize md5 md5sum md5sum_numeric
microseconds_add microseconds_sub milliseconds_add milliseconds_diff
milliseconds_sub minute minutes_add minutes_diff minutes_sub mod
money_format month monthname months_add months_diff months_sub
murmur_hash3_32 named_struct negative next_day ngram_search
ngram_search_case_insensitive now null_or_empty nullif parse_json
parse_url percentile_approx_raw percentile_empty percentile_hash pi pmod
positive pow power previous_day quarter quarters_add quarters_sub
query_id radians raise_error rand random regexp_count regexp_extract
regexp_extract_all regexp_position regexp_replace regexp_split repeat
replace replace_old reverse right round row rpad rtrim rtrim_string
sec_to_time second seconds_add seconds_diff seconds_sub sha2 sign sin
sinh sleep sm3 space split split_part sqrt square starts_with str2date
str_to_date str_to_jodatime str_to_map strcmp strleft strpos strright
sub_bitmap subdate substr substring substring_index tan tanh time_format
time_slice time_to_sec timediff timestamp to_base64 to_binary to_bitmap
to_date to_datetime to_datetime_ntz to_days to_iso8601 to_json
to_tera_date to_tera_timestamp tokenize translate trim trim_string
truncate ucase unhex unix_timestamp upper url_decode url_encode
url_extract_host url_extract_parameter utc_time utc_timestamp uuid
uuid_numeric uuid_v7 uuid_v7_numeric variant_query variant_typeof
version week week_iso weekday weekofyear weeks_add weeks_diff weeks_sub
xx_hash32 xx_hash3_128 xx_hash3_64 xx_hash64 year years_add years_diff
years_sub yearweek
""".split()

# Reference name → Spark builtin / expression equivalent (different name).
MAPPED: dict[str, str] = {
    "add": "the + operator (Column.__add__)",
    "adddate": "date_add", "subdate": "date_sub",
    "all_match": "forall", "any_match": "exists",
    "append_trailing_char_if_absent":
        "when(endswith(s, c), s).otherwise(concat(s, c))",
    "array_avg": "try_divide(aggregate(a, 0D, (x,y)->x+y), size(a))",
    "array_concat": "concat", "array_filter": "filter",
    "array_flatten": "flatten", "array_generate": "sequence",
    "array_length": "size", "array_map": "transform",
    "array_slice": "slice",
    "array_sort_lambda": "array_sort(a, comparator)",
    "array_sortby": "sort_by (via arrays_zip + array_sort + transform)",
    "array_sum": "aggregate(a, 0D, (x,y)->x+y)",
    "array_contains_all": "forall(b, x -> array_contains(a, x))",
    "array_contains_seq": "contains(array_join(a,\\u0001), array_join(b,\\u0001))",
    "array_cum_sum": "transform + aggregate over index prefix (or slice sums)",
    "array_difference": "zip_with(a, shift(a), (x,y) -> x - y)",
    "array_top_n": "slice(array_sort(a, desc-comparator), 1, n)",
    "bar": "repeat('█', round(width * x / max))",
    "base64_decode_binary": "unbase64", "base64_decode_string":
        "unbase64 + cast to string", "from_base64": "unbase64",
    "bit_shift_left": "shiftleft", "bit_shift_right": "shiftright",
    "bit_shift_right_logical": "shiftrightunsigned",
    "bitand": "the & operator", "bitor": "the | operator",
    "bitxor": "the ^ operator", "bitnot": "the ~ operator",
    "convert_tz": ("from_utc_timestamp(to_utc_timestamp(t, f), to) — "
                   "dialect-translated (plans/dialect.py, "
                   "sqltester-proven vs test_time_fn/test_convert_tz)"),
    "crc32_hash": "crc32",
    "curtime": "date_format(current_timestamp(), 'HH:mm:ss')",
    "current_time": "date_format(current_timestamp(), 'HH:mm:ss')",
    "date": "to_date", "dayofweek_iso": "weekday(d) + 1",
    "days_add": "date_add", "days_diff": "datediff",
    "days_sub": "date_sub",
    "dceil": "ceil", "dexp": "exp", "dfloor": "floor", "dlog1": "log",
    "dlog10": "log10", "dpow": "pow", "dround": "round", "dsqrt": "sqrt",
    "fpow": "pow", "fmod": "the % operator / mod",
    "distinct_map_keys": "map_from_entries(array_distinct(map_entries(m)))",
    "encode_fingerprint_sha256": "sha2(x, 256)",
    "ends_with": "endswith", "starts_with": "startswith",
    "equiwidth_bucket": "width_bucket",
    "field": "array_position(array(...), x)",
    "from_binary": "hex / decode(b, charset)",
    "from_days": "date_add(DATE'0000-01-01', n)",
    "from_unixtime_ms": "timestamp_millis",
    "get_json_bool": "get_json_object + cast boolean",
    "get_json_double": "get_json_object + cast double",
    "get_json_int": "get_json_object + cast bigint",
    "get_json_scalar": "get_json_object",
    "get_json_string": "get_json_object",
    "get_variant_bool": "try_variant_get(v, path, 'boolean')",
    "get_variant_date": "try_variant_get(v, path, 'date')",
    "get_variant_datetime": "try_variant_get(v, path, 'timestamp')",
    "get_variant_double": "try_variant_get(v, path, 'double')",
    "get_variant_int": "try_variant_get(v, path, 'bigint')",
    "get_variant_string": "try_variant_get(v, path, 'string')",
    "get_variant_time": "try_variant_get(v, path, 'string') (no TIME type)",
    "variant_query": "variant_get", "variant_typeof": "schema_of_variant",
    "hex_decode_binary": "unhex", "hex_decode_string":
        "unhex + cast to string",
    "hour_from_unixtime": "hour(from_unixtime(t))",
    "hours_add": "timestampadd(HOUR, n, t)",
    "hours_diff": "timestampdiff(HOUR, a, b)",
    "hours_sub": "timestampadd(HOUR, -n, t)",
    "if": "when(c, a).otherwise(b)",
    "is_json_scalar": "get_json_object(j, '$') == j (scalars echo)",
    "json_array": "to_json(array(...))", "json_object":
        "to_json(named_struct(...))",
    "json_contains": "array_contains(from_json(...)) / map lookup",
    "json_exists": "get_json_object IS NOT NULL",
    "json_keys": "json_object_keys", "json_length": "json_array_length",
    "json_pretty": "to_json (canonical form)",
    "json_query": "get_json_object", "json_remove":
        "from_json → map_filter → to_json",
    "json_set": "from_json → map_concat → to_json",
    "json_string": "to_json", "json_value": "get_json_object",
    "localtime": "current_timestamp",
    "ltrim_string": "ltrim(s, chars)", "rtrim_string": "rtrim(s, chars)",
    "trim_string": "trim(BOTH chars FROM s)",
    "makedate": "make_date(y, 1, 1) + date_add(doy - 1)",
    "map_apply": "transform_keys + transform_values",
    "map_size": "size",
    "md5sum": "md5(concat_ws('', ...))",
    "md5sum_numeric": "conv(substring(md5(...), 1, 15), 16, 10)",
    "microseconds_add": "timestampadd(MICROSECOND, n, t)",
    "microseconds_sub": "timestampadd(MICROSECOND, -n, t)",
    "milliseconds_add": "timestampadd(MILLISECOND, n, t)",
    "milliseconds_diff": "timestampdiff(MILLISECOND, a, b)",
    "milliseconds_sub": "timestampadd(MILLISECOND, -n, t)",
    "minutes_add": "timestampadd(MINUTE, n, t)",
    "minutes_diff": "timestampdiff(MINUTE, a, b)",
    "minutes_sub": "timestampadd(MINUTE, -n, t)",
    "seconds_add": "timestampadd(SECOND, n, t)",
    "seconds_diff": "timestampdiff(SECOND, a, b)",
    "seconds_sub": "timestampadd(SECOND, -n, t)",
    "months_add": "add_months", "months_diff":
        "timestampdiff(MONTH, a, b)", "months_sub": "add_months(t, -n)",
    "quarters_add": "add_months(t, 3n)", "quarters_sub":
        "add_months(t, -3n)",
    "weeks_add": "date_add(t, 7n)", "weeks_diff":
        "timestampdiff(WEEK, a, b)", "weeks_sub": "date_add(t, -7n)",
    "years_add": "add_months(t, 12n)", "years_diff":
        "timestampdiff(YEAR, a, b)", "years_sub": "add_months(t, -12n)",
    "mod": "the % operator / pmod",
    "murmur_hash3_32": "hash (Spark's hash IS murmur3_x86_32, seed 42)",
    "null_or_empty": "isnull(s) | (s == '')",
    "previous_day": "date_sub(next_day(date_sub(d, 7), dow), 0)",
    "regexp_position": "locate(regexp_extract(s, re, 0), s)",
    "regexp_split": "split",
    "replace_old": "replace",
    "row": "struct",
    "sec_to_time": "date_format(timestamp_seconds(n), 'HH:mm:ss')",
    "time_to_sec": "unix_timestamp(t) % 86400",
    "time_format": "date_format",
    "timediff": "timestampdiff(SECOND, b, a) (as interval seconds)",
    "timestamp": "to_timestamp",
    "space": "repeat(' ', n)",
    "square": "x * x (or pow(x, 2))",
    "strcmp": "when(a < b, -1).when(a > b, 1).otherwise(0)",
    "strleft": "left", "strright": "right",
    "strpos": "locate / instr",
    "to_base64": "base64",
    "to_datetime": "to_timestamp", "to_datetime_ntz": "to_timestamp_ntz",
    "to_days": "datediff(d, DATE'0000-01-01')",
    "to_iso8601": "date_format(t, \"yyyy-MM-dd'T'HH:mm:ss.SSSSSS\")",
    "truncate": "floor(x * pow(10, d)) / pow(10, d)",
    "url_extract_host": "parse_url(u, 'HOST')",
    "url_extract_parameter": "parse_url(u, 'QUERY', key)",
    "utc_time": "date_format(utc_timestamp, 'HH:mm:ss')",
    "utc_timestamp": "to_utc_timestamp(current_timestamp(), tz)",
    "week": "weekofyear (mode 0 default; other modes via extract)",
    "week_iso": "weekofyear",
    "yearweek": ("mode-0 Sunday-week composition, dialect-translated "
                 "(plans/dialect.py _rw_yearweek; sqltester-proven)"),
    "xx_hash64": "xxhash64", "xx_hash3_64": "xxhash64 (xx64 variant)",
    "cardinality": "size",
}

# Reference name → repo module implementing it.
REPO: dict[str, str] = {
    # batched mapInPandas operator (deterministic fake backend +
    # RemoteBackend plug-in; oracle-checked via ai_query_enrich)
    "ai_query": "starrocks_spark/operators/ai.py",
    "approx_cosine_similarity": "starrocks_spark/functions/vector.py",
    "approx_l2_distance": "starrocks_spark/functions/vector.py",
    "cosine_similarity": "starrocks_spark/functions/vector.py",
    "cosine_similarity_norm": "starrocks_spark/functions/vector.py",
    "l2_distance": "starrocks_spark/functions/vector.py",
    "array_to_bitmap": "starrocks_spark/functions/bitmap.py",
    "base64_to_bitmap": "starrocks_spark/functions/bitmap.py",
    "bitmap_and": "starrocks_spark/functions/bitmap.py",
    "bitmap_andnot": "starrocks_spark/functions/bitmap.py",
    "bitmap_contains": "starrocks_spark/functions/bitmap.py",
    "bitmap_count": "starrocks_spark/functions/bitmap.py",
    "bitmap_empty": "starrocks_spark/functions/bitmap.py",
    "bitmap_from_binary": "starrocks_spark/functions/bitmap.py",
    "bitmap_from_string": "starrocks_spark/functions/bitmap.py",
    "bitmap_has_any": "starrocks_spark/functions/bitmap.py",
    "bitmap_hash": "starrocks_spark/functions/bitmap.py",
    "bitmap_hash64": "starrocks_spark/functions/bitmap.py",
    "bitmap_max": "starrocks_spark/functions/bitmap.py",
    "bitmap_min": "starrocks_spark/functions/bitmap.py",
    "bitmap_or": "starrocks_spark/functions/bitmap.py",
    "bitmap_remove": "starrocks_spark/functions/bitmap.py",
    "bitmap_subset_in_range": "starrocks_spark/functions/bitmap.py",
    "bitmap_subset_limit": "starrocks_spark/functions/bitmap.py",
    "bitmap_to_array": "starrocks_spark/functions/bitmap.py",
    "bitmap_to_base64": "starrocks_spark/functions/bitmap.py",
    "bitmap_to_binary": "starrocks_spark/functions/bitmap.py",
    "bitmap_to_string": "starrocks_spark/functions/bitmap.py",
    "bitmap_xor": "starrocks_spark/functions/bitmap.py",
    "sub_bitmap": "starrocks_spark/functions/bitmap.py",
    "to_bitmap": "starrocks_spark/functions/bitmap.py",
    "hll_cardinality": "starrocks_spark/operators/sketches.py",
    "hll_deserialize": "starrocks_spark/operators/sketches.py",
    "hll_empty": "starrocks_spark/operators/sketches.py",
    "hll_hash": "starrocks_spark/operators/sketches.py",
    "hll_serialize": "starrocks_spark/operators/sketches.py",
    "percentile_approx_raw": "starrocks_spark/operators/sketches.py",
    "percentile_empty": "starrocks_spark/operators/sketches.py",
    "percentile_hash": "starrocks_spark/operators/sketches.py",
    "inet_aton": "starrocks_spark/functions/net.py",
    "money_format": "starrocks_spark/functions/scalar.py",
    "format_bytes": "starrocks_spark/functions/scalar.py",
    "time_slice": "starrocks_spark/functions/scalar.py",
    "date_slice": "starrocks_spark/functions/scalar.py",
    "ngram_search": "starrocks_spark/functions/text.py",
    "ngram_search_case_insensitive": "starrocks_spark/functions/text.py",
    "tokenize": "starrocks_spark/functions/text.py",
    "str2date": "starrocks_spark/plans/dialect.py",
    "encode_sort_key": "starrocks_spark/functions/sortkey.py",
    "str_to_date": "starrocks_spark/plans/dialect.py",
    "jodatime_format": "starrocks_spark/plans/dialect.py",
    "str_to_jodatime": "starrocks_spark/plans/dialect.py",
    "to_tera_date": "starrocks_spark/plans/dialect.py",
    "to_tera_timestamp": "starrocks_spark/plans/dialect.py",
}

# Reference name → why it is out of scope for a Spark data plane.
NA: dict[str, str] = {
    **{n: "Iceberg partition-transform intrinsic (Spark's Iceberg "
          "connector supplies these)" for n in REFERENCE_NAMES
       if n.startswith("__iceberg_transform")},
    "http_request": "server-side HTTP call surface",
    "esquery": "Elasticsearch pushdown marker (no ES scan; SURVEY §2.1)",
    "get_query_profile": "server introspection",
    "is_role_in_session": "server auth introspection",
    "last_query_id": "server introspection",
    "query_id": "server introspection",
    "host_name": "server introspection",
    "current_version": "server introspection",
    "version": "server introspection (Spark exposes version())",
    "sleep": "side-effecting test helper",
    "materialize": "optimizer barrier intrinsic",
    "dict_encode": "storage-internal dictionary encoding (Parquet "
                   "encodes natively)",
    "blake3": "digest not available in the JVM (md5/sha2/crc32 covered)",
    "sm3": "digest not available in the JVM (md5/sha2/crc32 covered)",
    "xx_hash32": "32-bit xxhash variant (xxhash64 covered)",
    "xx_hash3_128": "128-bit xxhash variant (xxhash64 covered)",
    "uuid_numeric": "uuid-as-largeint (no int128 type; uuid() covered)",
    "uuid_v7": "time-ordered uuid variant (uuid() covered)",
    "uuid_v7_numeric": "uuid-as-largeint (no int128 type)",
}


def identical_names() -> list[str]:
    import pyspark.sql.functions as F

    spark_names = set(dir(F))
    classified = MAPPED.keys() | REPO.keys() | NA.keys()
    return [n for n in REFERENCE_NAMES
            if n in spark_names and n not in classified]


def classify() -> dict[str, tuple[str, str]]:
    """name → (status, detail) for every reference name."""
    out: dict[str, tuple[str, str]] = {}
    for n in identical_names():
        out[n] = ("identical", "pyspark.sql.functions." + n)
    for n, d in MAPPED.items():
        out[n] = ("mapped", d)
    for n, d in REPO.items():
        out[n] = ("repo", d)
    for n, d in NA.items():
        out[n] = ("n/a", d)
    return out


def unclassified() -> list[str]:
    c = classify()
    return [n for n in REFERENCE_NAMES if n not in c]


def write_markdown(path: str = "FUNCTIONS.md") -> None:
    c = classify()
    counts = {"identical": 0, "mapped": 0, "repo": 0, "n/a": 0}
    for n in REFERENCE_NAMES:
        counts[c[n][0]] += 1
    lines = [
        "# Scalar-function coverage vs the reference registry",
        "",
        "Generated by `python -m starrocks_spark.functions.coverage` "
        "from the ledger in `starrocks_spark/functions/coverage.py`; "
        "kept total by `tests/test_scalar_functions.py`.",
        "",
        f"Reference names: **{len(REFERENCE_NAMES)}** — "
        f"identical Spark builtin: **{counts['identical']}**, "
        f"mapped to a Spark expression: **{counts['mapped']}**, "
        f"implemented in this repo: **{counts['repo']}**, "
        f"not applicable: **{counts['n/a']}**.",
        "",
        "| Reference name | Status | Spark equivalent / where / why |",
        "|---|---|---|",
    ]
    for n in REFERENCE_NAMES:
        status, detail = c[n]
        lines.append(f"| `{n}` | {status} | {detail} |")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    missing = unclassified()
    if missing:
        raise SystemExit(f"unclassified reference names: {missing}")
    write_markdown()
    print(f"FUNCTIONS.md written ({len(REFERENCE_NAMES)} names)")
