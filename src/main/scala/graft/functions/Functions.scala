package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Scalar-function surface of the reference engine (complete registry at
  * reference functions.rs:180-295, registered 304-397), re-expressed over
  * `org.apache.spark.sql.functions` so every function stays inside
  * whole-stage codegen. Where Spark's builtin has different semantics than
  * the reference (reference concat skips NULLs, functions.rs:72-73; numeric
  * trunc, date_bin, regexp_match first-match capture groups, from_unixtime returning a
  * timestamp) the gap is closed here with composable expressions — no UDFs,
  * no codegen breaks.
  *
  * Naming: snake_case mirrors the reference's Python surface; each simply
  * delegates or composes.
  */
object Functions {

  // --- column / literal / alias (reference expression.rs:104-117) ----------
  def col(name: String): Column = F.col(name)
  def literal(v: Any): Column = F.lit(v)
  def alias(c: Column, name: String): Column = c.as(name)

  // --- math (reference functions.rs:180-295) -------------------------------
  def abs(c: Column): Column = F.abs(c)
  def acos(c: Column): Column = F.acos(c)
  def asin(c: Column): Column = F.asin(c)
  def atan(c: Column): Column = F.atan(c)
  def atan2(y: Column, x: Column): Column = F.atan2(y, x)
  def cos(c: Column): Column = F.cos(c)
  def sin(c: Column): Column = F.sin(c)
  def tan(c: Column): Column = F.tan(c)
  def ceil(c: Column): Column = F.ceil(c)
  def floor(c: Column): Column = F.floor(c)
  def round(c: Column, scale: Int = 0): Column = F.round(c, scale)
  def exp(c: Column): Column = F.exp(c)
  def ln(c: Column): Column = F.log(c)
  def log(c: Column): Column = F.log(c) // DataFusion log = natural log
  def log10(c: Column): Column = F.log10(c)
  def log2(c: Column): Column = F.log2(c)
  def power(base: Column, exponent: Column): Column = F.pow(base, exponent)
  def sqrt(c: Column): Column = F.sqrt(c)
  def signum(c: Column): Column = F.signum(c)
  def random(): Column = F.rand()

  /** Numeric truncation toward zero at `digits` decimal places — the
    * reference's `trunc` (functions.rs:286) is numeric while Spark's builtin
    * `trunc` is date-oriented; composed from signum/floor so it stays
    * codegen'd. */
  def trunc_numeric(c: Column, digits: Int = 0): Column = {
    val scale = math.pow(10.0, digits)
    F.signum(c) * F.floor(F.abs(c) * scale) / scale
  }
  /** Column-typed digits variant (used by the name-based registry, where the
    * digit count arrives as an expression). */
  def trunc_numeric(c: Column, digits: Column): Column = {
    val scale = F.pow(F.lit(10.0), digits)
    F.signum(c) * F.floor(F.abs(c) * scale) / scale
  }

  // --- strings (reference functions.rs:180-295) ----------------------------
  def ascii(c: Column): Column = F.ascii(c)
  def chr(c: Column): Column = F.chr(c)
  def bit_length(c: Column): Column = F.bit_length(c)
  def octet_length(c: Column): Column = F.octet_length(c)
  def character_length(c: Column): Column = F.length(c)
  def char_length(c: Column): Column = F.length(c)
  def length(c: Column): Column = F.length(c)
  def btrim(c: Column): Column = F.trim(c)
  def btrim(c: Column, trimStr: String): Column = F.trim(c, trimStr)
  def ltrim(c: Column): Column = F.ltrim(c)
  def ltrim(c: Column, trimStr: String): Column = F.ltrim(c, trimStr)
  def rtrim(c: Column): Column = F.rtrim(c)
  def rtrim(c: Column, trimStr: String): Column = F.rtrim(c, trimStr)
  def trim(c: Column): Column = F.trim(c)

  /** Reference `concat` skips NULL arguments (functions.rs:72-73 "NULL
    * arguments are ignored") while Spark's `concat` nulls out the whole
    * result — `concat_ws("")` reproduces the reference semantics. */
  def concat(cs: Column*): Column = F.concat_ws("", cs: _*)
  def concat_ws(sep: String, cs: Column*): Column = F.concat_ws(sep, cs: _*)

  def initcap(c: Column): Column = F.initcap(c)
  def lower(c: Column): Column = F.lower(c)
  def upper(c: Column): Column = F.upper(c)
  def left(c: Column, n: Int): Column = F.substring(c, 1, n)
  def right(c: Column, n: Int): Column = F.substring(c, -n, n)
  def lpad(c: Column, len: Int, pad: String): Column = F.lpad(c, len, pad)
  def rpad(c: Column, len: Int, pad: String): Column = F.rpad(c, len, pad)
  def repeat(c: Column, n: Int): Column = F.repeat(c, n)
  def replace(c: Column, search: String, repl: String): Column =
    F.regexp_replace(c, java.util.regex.Pattern.quote(search),
      java.util.regex.Matcher.quoteReplacement(repl))
  def reverse(c: Column): Column = F.reverse(c)
  def translate(c: Column, from: String, to: String): Column =
    F.translate(c, from, to)
  def split_part(c: Column, delim: String, n: Int): Column =
    F.element_at(F.split(c, java.util.regex.Pattern.quote(delim)), n)
  def starts_with(c: Column, prefix: String): Column = c.startsWith(prefix)
  def strpos(c: Column, substr: String): Column = F.instr(c, substr)
  def substr(c: Column, pos: Int, len: Int): Column = F.substring(c, pos, len)
  def substr(c: Column, pos: Int): Column =
    F.substring(c, pos, Int.MaxValue)
  def to_hex(c: Column): Column = F.hex(c)

  /** regexp_match (reference functions.rs:222): PostgreSQL-style FIRST-match
    * semantics — the array of capture groups of the first match (the whole
    * match when the pattern has no capture groups); NULL when the pattern
    * does not match. The group count is read from the literal pattern at
    * plan time, so this composes into per-group `regexp_extract` calls
    * guarded by `regexp_like` — all codegen'd builtins. */
  def regexp_match(c: Column, pattern: String): Column = {
    val n = java.util.regex.Pattern.compile(pattern).matcher("").groupCount()
    val groups = if (n == 0) Seq(0) else 1 to n
    val arr = F.array(groups.map(g => F.regexp_extract(c, pattern, g)): _*)
    F.when(F.regexp_like(c, F.lit(pattern)), arr)
  }

  /** All whole-pattern matches as an array — the companion "find every
    * occurrence" form (regexp_extract_all group 0), kept under its own name
    * beside the PostgreSQL-style first-match `regexp_match`. */
  def regexp_match_all(c: Column, pattern: String): Column =
    F.regexp_extract_all(c, F.lit(pattern), F.lit(0))
  def regexp_replace(c: Column, pattern: String, repl: String): Column =
    F.regexp_replace(c, pattern, repl)

  // --- hash / crypto (reference functions.rs:62-70,214-218,247-250) --------
  def md5(c: Column): Column = F.md5(c)
  def sha224(c: Column): Column = F.sha2(c, 224)
  def sha256(c: Column): Column = F.sha2(c, 256)
  def sha384(c: Column): Column = F.sha2(c, 384)
  def sha512(c: Column): Column = F.sha2(c, 512)

  /** `digest(value, method)` (reference functions.rs:62-70) — the full
    * method enum. blake2b/blake2s are native Catalyst expressions
    * implemented from RFC 7693 and blake3 from its public specification
    * (the JVM has no provider and no library may be added — see
    * graft.expressions.{Blake2, Blake3}; spec/RFC vectors asserted in
    * Blake2Spec/Blake3Spec). */
  def digest(c: Column, method: String): Column = method.toLowerCase match {
    case "md5"     => F.md5(c)
    case "sha224"  => F.sha2(c, 224)
    case "sha256"  => F.sha2(c, 256)
    case "sha384"  => F.sha2(c, 384)
    case "sha512"  => F.sha2(c, 512)
    case "blake2b" => graft.expressions.Blake2.blake2b(c.cast("binary"))
    case "blake2s" => graft.expressions.Blake2.blake2s(c.cast("binary"))
    case "blake3"  => graft.expressions.Blake3.blake3(c.cast("binary"))
    case m => throw new IllegalArgumentException(s"unknown digest method $m")
  }

  // --- date/time (reference functions.rs:272-283,293) ----------------------
  def now(): Column = F.current_timestamp()
  def current_date(): Column = F.current_date()

  /** No TIME type in Spark (documented divergence, SURVEY §2.8): the
    * reference's `current_time` maps to an HH:mm:ss string. */
  def current_time(): Column =
    F.date_format(F.current_timestamp(), "HH:mm:ss")

  def to_timestamp(c: Column): Column = c.cast("timestamp")
  def to_timestamp_seconds(c: Column): Column = F.timestamp_seconds(c)
  def to_timestamp_millis(c: Column): Column = F.timestamp_millis(c)
  def to_timestamp_micros(c: Column): Column = F.timestamp_micros(c)

  /** Reference `from_unixtime` returns a timestamp (functions.rs:293);
    * Spark's builtin of that name returns a string, so this maps to
    * timestamp_seconds. */
  def from_unixtime(c: Column): Column = F.timestamp_seconds(c)

  def date_part(field: String, c: Column): Column =
    F.date_part(F.lit(field), c)
  def date_trunc(unit: String, c: Column): Column = F.date_trunc(unit, c)

  /** `date_bin(stride, source, origin)` (reference functions.rs:283): tumble
    * `source` into fixed `stride` windows anchored at `origin`. No Spark
    * builtin — composed as origin + floor((source-origin)/stride)*stride on
    * microsecond longs (integer arithmetic end-to-end, codegen-friendly,
    * exact at any scale). */
  def date_bin(stride: String, source: Column, origin: Column): Column = {
    val strideUs =
      F.expr(s"unix_micros(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL $stride)")
    val src = F.unix_micros(source)
    val org = F.unix_micros(origin)
    // floor division gives correct bins for sources before the origin too;
    // offsets fit double exactly (|offset µs| ≪ 2^53 for any sane range)
    val bins = F.floor((src - org).cast("double") / strideUs.cast("double"))
      .cast("long")
    F.timestamp_micros(org + bins * strideUs)
  }

  // --- conditional / misc / array (reference functions.rs:52-60,201,288-294)
  def coalesce(cs: Column*): Column = F.coalesce(cs: _*)
  def nullif(a: Column, b: Column): Column = F.nullif(a, b)
  def in_list(c: Column, values: Seq[Any], negated: Boolean = false): Column =
    if (negated) !c.isin(values: _*) else c.isin(values: _*)
  def make_array(cs: Column*): Column = F.array(cs: _*)
  def array(cs: Column*): Column = F.array(cs: _*)
  def arrow_typeof(c: Column): Column = F.typeof(c)

  // --- aggregates (reference functions.rs:297-302, macro 158-178) ----------
  def avg(c: Column, distinct: Boolean = false): Column =
    if (distinct) avgDistinct(c) else F.avg(c)
  /** avg(DISTINCT x) composed as sum(DISTINCT)/count(DISTINCT) — Spark's
    * functions API has no distinct-avg builder. */
  def avgDistinct(c: Column): Column =
    F.sum_distinct(c) / F.count_distinct(c)
  def count(c: Column, distinct: Boolean = false): Column =
    if (distinct) F.count_distinct(c) else F.count(c)
  def count_star(): Column = F.count(F.lit(1))
  def max(c: Column): Column = F.max(c)
  def min(c: Column): Column = F.min(c)
  def sum(c: Column, distinct: Boolean = false): Column =
    if (distinct) F.sum_distinct(c) else F.sum(c)
  def approx_distinct(c: Column): Column = F.approx_count_distinct(c)

  /** Name-based scalar-function lookup, the Spark analog of DataFusion's
    * function registry reached through `ctx.sql` (reference functions.rs:
    * 304-397). Names not listed here fall through to Spark's own
    * `call_function`, which resolves any builtin. */
  def byName(name: String, args: Column*): Column = name.toLowerCase match {
    case "concat"        => concat(args: _*)
    case "trunc"         =>
      if (args.length >= 2) trunc_numeric(args.head, args(1))
      else trunc_numeric(args.head)
    case "ln" | "log"    => F.log(args.head)
    case "from_unixtime" => from_unixtime(args.head)
    case "now"           => now()
    case "current_time"  => current_time()
    case "regexp_match"  =>
      regexp_match(args.head, litString(args(1), "regexp_match pattern"))
    case "regexp_match_all" =>
      F.regexp_extract_all(args.head, args(1), F.lit(0))
    case "random"        => F.rand()
    case "count_star"    => count_star()
    case "approx_distinct" => approx_distinct(args.head)
    case "power"         => F.pow(args.head, args(1))
    case "make_array" | "array" => F.array(args: _*)
    case "arrow_typeof"  => F.typeof(args.head)
    case other           => F.call_function(other, args: _*)
  }

  /** Literal string value of a Column argument — regex patterns must be
    * known at plan time so the capture-group count can resolve. Uses the
    * ColumnBridge shim (Spark 4 removed `Column.expr`). */
  private def litString(c: Column, what: String): String =
    org.apache.spark.sql.graftbridge.ColumnBridge.litString(c).getOrElse(
      throw new IllegalArgumentException(
        s"$what must be a string literal, got: $c"))
}
