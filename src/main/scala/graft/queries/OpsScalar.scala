package graft.queries

import graft.Tables
import graft.functions.{Functions => Fx}
import org.apache.spark.sql.functions._

/** Scalar-function batteries covering the complete registry of SURVEY.md
  * §2.8 (reference functions.rs:180-295) and the expression operators of
  * §2.9 (reference expression.rs:48-137), each exercised through
  * `graft.functions.Functions` over the driver tables with a DuckDB oracle.
  *
  * Oracle parity notes (verified against DuckDB 1.0):
  *  - transcendental results are rounded to 6 decimals (libm vs java.lang
  *    .Math may differ in the last ulp);
  *  - pure arithmetic / floor / trunc compositions are left unrounded —
  *    identical IEEE ops are bit-exact;
  *  - ceil casts to DOUBLE on both sides (Spark→LONG, DuckDB→DECIMAL);
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all; DuckDB has no initcap/signum (emulated / sign);
  *  - double→int casts are avoided entirely (Spark truncates, DuckDB
  *    rounds).
  */
object OpsScalar extends Suite {

  // -- math battery over the 50 distinct quantities -------------------------
  private val fnMath: Q = (s, dir) => {
    val t = Tables(s, dir)
    val q = col("q")
    t.lineitem.select(col("l_quantity").as("q")).distinct()
      .select(q,
        Fx.abs(q - 25.0).as("abs_v"),
        Fx.ceil(q / 7.0).cast("double").as("ceil_v"),
        Fx.floor(q / 7.0).cast("double").as("floor_v"),
        Fx.round(q / 7.0, 2).as("round_v"),
        round(Fx.exp(q / 50.0), 6).as("exp_v"),
        round(Fx.ln(q), 6).as("ln_v"),
        round(Fx.log10(q), 6).as("log10_v"),
        round(Fx.log2(q), 6).as("log2_v"),
        Fx.power(q, lit(2.0)).as("pow_v"),
        round(Fx.sqrt(q), 6).as("sqrt_v"),
        Fx.signum(q - 25.0).as("sign_v"),
        round(Fx.sin(q / 50.0), 6).as("sin_v"),
        round(Fx.cos(q / 50.0), 6).as("cos_v"),
        round(Fx.tan(q / 50.0), 6).as("tan_v"),
        round(Fx.asin(q / 50.0), 6).as("asin_v"),
        round(Fx.acos(q / 50.0), 6).as("acos_v"),
        round(Fx.atan(q / 50.0), 6).as("atan_v"),
        round(Fx.atan2(q, lit(7.0)), 6).as("atan2_v"))
      .orderBy(q)
  }
  private val fnMathSql =
    """SELECT q,
      |  abs(q - 25.0) AS abs_v,
      |  CAST(ceil(q / 7.0) AS DOUBLE) AS ceil_v,
      |  CAST(floor(q / 7.0) AS DOUBLE) AS floor_v,
      |  round(q / 7.0, 2) AS round_v,
      |  round(exp(q / 50.0), 6) AS exp_v,
      |  round(ln(q), 6) AS ln_v,
      |  round(log10(q), 6) AS log10_v,
      |  round(log2(q), 6) AS log2_v,
      |  pow(q, 2.0) AS pow_v,
      |  round(sqrt(q), 6) AS sqrt_v,
      |  CAST(sign(q - 25.0) AS DOUBLE) AS sign_v,
      |  round(sin(q / 50.0), 6) AS sin_v,
      |  round(cos(q / 50.0), 6) AS cos_v,
      |  round(tan(q / 50.0), 6) AS tan_v,
      |  round(asin(q / 50.0), 6) AS asin_v,
      |  round(acos(q / 50.0), 6) AS acos_v,
      |  round(atan(q / 50.0), 6) AS atan_v,
      |  round(atan2(q, 7.0), 6) AS atan2_v
      |FROM (SELECT DISTINCT l_quantity AS q FROM lineitem)
      |ORDER BY q""".stripMargin

  // -- numeric trunc (gap function — identical floor composition both sides)
  private val fnTrunc: Q = (s, dir) => {
    val t = Tables(s, dir)
    val x = (col("l_extendedprice") * -1.337).as("x")
    t.lineitem.filter(col("l_orderkey") < 300)
      .select(col("l_extendedprice"), x)
      .select(col("l_extendedprice"), col("x"),
        Fx.trunc_numeric(col("x"), 2).as("trunc2"),
        Fx.trunc_numeric(col("x"), 0).as("trunc0"))
      .orderBy(col("l_extendedprice"), col("x"))
  }
  private val fnTruncSql =
    """SELECT l_extendedprice, l_extendedprice * -1.337 AS x,
      |  sign(l_extendedprice * -1.337)
      |    * floor(abs(l_extendedprice * -1.337) * 100.0) / 100.0 AS trunc2,
      |  sign(l_extendedprice * -1.337)
      |    * floor(abs(l_extendedprice * -1.337) * 1.0) / 1.0 AS trunc0
      |FROM lineitem WHERE l_orderkey < 300
      |ORDER BY l_extendedprice, x""".stripMargin

  // -- string battery over customer names -----------------------------------
  private val fnString: Q = (s, dir) => {
    val t = Tables(s, dir)
    val n = col("c_name")
    t.customer.filter(col("c_custkey") < 200)
      .select(col("c_custkey"), n,
        Fx.ascii(n).as("ascii_v"),
        Fx.chr(lit(65) + col("c_custkey") % 26).as("chr_v"),
        Fx.length(n).as("len_v"),
        Fx.lower(n).as("lower_v"),
        Fx.upper(n).as("upper_v"),
        Fx.left(n, 4).as("left_v"),
        Fx.right(n, 3).as("right_v"),
        Fx.lpad(n, 25, "*").as("lpad_v"),
        Fx.rpad(n, 25, "*").as("rpad_v"),
        Fx.repeat(Fx.right(n, 2), 3).as("repeat_v"),
        Fx.replace(n, "Customer", "Cust").as("replace_v"),
        Fx.reverse(n).as("reverse_v"),
        Fx.translate(n, "Custo", "KATS0").as("translate_v"),
        Fx.split_part(n, "#", 2).as("split_part_v"),
        Fx.starts_with(n, "Customer").as("starts_v"),
        Fx.strpos(n, "ustom").as("strpos_v"),
        Fx.substr(n, 3, 5).as("substr_v"),
        upper(Fx.to_hex(col("c_custkey"))).as("hex_v"),
        Fx.initcap(Fx.lower(n)).as("initcap_v"),
        Fx.concat(n, lit(null).cast("string"), lit("!")).as("concat_v"),
        Fx.concat_ws("-", n, lit(null).cast("string"), lit("x"))
          .as("concat_ws_v"),
        Fx.btrim(Fx.lpad(n, 25, "*"), "*").as("btrim_v"),
        Fx.ltrim(Fx.lpad(n, 25, "*"), "*").as("ltrim_v"),
        Fx.rtrim(Fx.rpad(n, 25, "*"), "*").as("rtrim_v"))
      .orderBy(col("c_custkey"))
  }
  private val fnStringSql =
    """SELECT c_custkey, c_name,
      |  ascii(c_name) AS ascii_v,
      |  chr(CAST(65 + c_custkey % 26 AS INT)) AS chr_v,
      |  CAST(length(c_name) AS INT) AS len_v,
      |  lower(c_name) AS lower_v,
      |  upper(c_name) AS upper_v,
      |  left(c_name, 4) AS left_v,
      |  right(c_name, 3) AS right_v,
      |  lpad(c_name, 25, '*') AS lpad_v,
      |  rpad(c_name, 25, '*') AS rpad_v,
      |  repeat(right(c_name, 2), 3) AS repeat_v,
      |  replace(c_name, 'Customer', 'Cust') AS replace_v,
      |  reverse(c_name) AS reverse_v,
      |  translate(c_name, 'Custo', 'KATS0') AS translate_v,
      |  split_part(c_name, '#', 2) AS split_part_v,
      |  starts_with(c_name, 'Customer') AS starts_v,
      |  CAST(strpos(c_name, 'ustom') AS INT) AS strpos_v,
      |  substr(c_name, 3, 5) AS substr_v,
      |  upper(to_hex(c_custkey)) AS hex_v,
      |  upper(substr(lower(c_name), 1, 1)) || substr(lower(c_name), 2)
      |    AS initcap_v,
      |  concat(c_name, CAST(NULL AS VARCHAR), '!') AS concat_v,
      |  concat_ws('-', c_name, CAST(NULL AS VARCHAR), 'x') AS concat_ws_v,
      |  trim(lpad(c_name, 25, '*'), '*') AS btrim_v,
      |  ltrim(lpad(c_name, 25, '*'), '*') AS ltrim_v,
      |  rtrim(rpad(c_name, 25, '*'), '*') AS rtrim_v
      |FROM customer WHERE c_custkey < 200
      |ORDER BY c_custkey""".stripMargin

  // -- regex battery --------------------------------------------------------
  // Array-valued regexp results are serialized through array_join on both
  // sides: the driver's checker hash-compares pandas frames and cannot sort
  // array cells. The array ops stay under test — '|'-joined group lists are a
  // bijection of the arrays for these inputs. Covers regexp_match's
  // PostgreSQL first-match semantics: no-group pattern (whole match),
  // multi-group pattern (group captures), and the NULL-on-no-match contract.
  private val fnRegex: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer.filter(col("c_custkey") < 200)
      .select(col("c_custkey"), col("c_name"),
        Fx.regexp_replace(col("c_name"), "0", "_").as("rr_v"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("re_v"),
        array_join(Fx.regexp_match(col("c_name"), "\\d\\d"), "|").as("rm0_v"),
        array_join(Fx.regexp_match(col("c_name"), "(C\\w+)#(\\d+)"), "|")
          .as("rm2_v"),
        array_join(Fx.regexp_match(col("c_name"), "zzz(\\d+)"), "|")
          .as("rmnull_v"),
        array_join(Fx.regexp_match_all(col("c_name"), "\\d\\d"), "|")
          .as("rma_v"))
      .orderBy(col("c_custkey"))
  }
  private val fnRegexSql =
    """SELECT c_custkey, c_name,
      |  regexp_replace(c_name, '0', '_', 'g') AS rr_v,
      |  regexp_extract(c_name, 'Customer#(\d+)', 1) AS re_v,
      |  CASE WHEN regexp_matches(c_name, '\d\d')
      |       THEN regexp_extract(c_name, '\d\d', 0) END AS rm0_v,
      |  CASE WHEN regexp_matches(c_name, '(C\w+)#(\d+)')
      |       THEN regexp_extract(c_name, '(C\w+)#(\d+)', 1) || '|' ||
      |            regexp_extract(c_name, '(C\w+)#(\d+)', 2) END AS rm2_v,
      |  CASE WHEN regexp_matches(c_name, 'zzz(\d+)')
      |       THEN regexp_extract(c_name, 'zzz(\d+)', 1) END AS rmnull_v,
      |  array_to_string(regexp_extract_all(c_name, '\d\d'), '|') AS rma_v
      |FROM customer WHERE c_custkey < 200
      |ORDER BY c_custkey""".stripMargin

  // -- hash battery (md5/sha256 have DuckDB twins; sha224/384/512 are
  //    rows-only here and golden-vector-tested in scalatest) ----------------
  private val fnHash: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer.filter(col("c_custkey") < 100)
      .select(col("c_custkey"),
        Fx.md5(col("c_name")).as("md5_v"),
        Fx.sha256(col("c_name")).as("sha256_v"))
      .orderBy(col("c_custkey"))
  }
  private val fnHashSql =
    """SELECT c_custkey, md5(c_name) AS md5_v, sha256(c_name) AS sha256_v
      |FROM customer WHERE c_custkey < 100
      |ORDER BY c_custkey""".stripMargin

  private val fnHashSha2: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer.filter(col("c_custkey") < 100)
      .select(col("c_custkey"),
        Fx.sha224(col("c_name")).as("sha224_v"),
        Fx.sha384(col("c_name")).as("sha384_v"),
        Fx.sha512(col("c_name")).as("sha512_v"),
        Fx.digest(col("c_name"), "sha512").as("digest_v"),
        // spec-native kernels (no DuckDB twin; RFC 7693 vectors in
        // Blake2Spec, official BLAKE3 vectors in Blake3Spec)
        Fx.digest(col("c_name"), "blake2b").as("blake2b_v"),
        Fx.digest(col("c_name"), "blake2s").as("blake2s_v"),
        Fx.digest(col("c_name"), "blake3").as("blake3_v"))
      .orderBy(col("c_custkey"))
  }

  // -- datetime battery over orders -----------------------------------------
  private val fnDatetime: Q = (s, dir) => {
    val t = Tables(s, dir)
    val d = col("o_orderdate")
    t.orders.filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"), d,
        Fx.date_part("year", d).cast("long").as("year_v"),
        Fx.date_part("month", d).cast("long").as("month_v"),
        Fx.date_part("day", d).cast("long").as("day_v"),
        Fx.date_trunc("month", d).as("trunc_month"),
        Fx.date_trunc("day", d).as("trunc_day"),
        to_timestamp(date_format(d, "yyyy-MM-dd HH:mm:ss")).as("roundtrip_ts"),
        unix_timestamp(d).as("epoch_v"),
        Fx.from_unixtime(unix_timestamp(d)).as("from_unix_v"),
        // date→string keeps the compare representation-independent (pandas
        // folds DATE back into datetime64 otherwise)
        d.cast("date").cast("string").as("date_v"))
      .orderBy(col("o_orderkey"))
  }
  private val fnDatetimeSql =
    """SELECT o_orderkey, o_orderdate,
      |  date_part('year', o_orderdate) AS year_v,
      |  date_part('month', o_orderdate) AS month_v,
      |  date_part('day', o_orderdate) AS day_v,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS trunc_month,
      |  CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS trunc_day,
      |  CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)
      |    AS roundtrip_ts,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_v,
      |  CAST(to_timestamp(floor(epoch(o_orderdate))) AS TIMESTAMP)
      |    AS from_unix_v,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_v
      |FROM orders WHERE o_orderkey < 500
      |ORDER BY o_orderkey""".stripMargin

  // -- datetime battery over events (sub-day times + date_bin gap fn) -------
  private val fnDatetimeEvents: Q = (s, dir) => {
    val t = Tables(s, dir)
    val ts = col("ts")
    t.events.filter(col("event_id") < 2000)
      .select(col("event_id"), ts,
        Fx.date_part("hour", ts).cast("long").as("hour_v"),
        Fx.date_part("minute", ts).cast("long").as("minute_v"),
        Fx.date_bin("15 MINUTE", ts,
          lit("2024-01-01 00:00:00").cast("timestamp")).as("bin15m"),
        Fx.date_bin("1 HOUR", ts,
          lit("2024-01-01 00:00:00").cast("timestamp")).as("bin1h"))
      .orderBy(col("event_id"))
  }
  private val fnDatetimeEventsSql =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
      |  date_part('hour', ts) AS hour_v,
      |  date_part('minute', ts) AS minute_v,
      |  make_timestamp(epoch_us(TIMESTAMP '2024-01-01 00:00:00')
      |    + ((epoch_us(CAST(ts AS TIMESTAMP))
      |        - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 900000000)
      |      * 900000000) AS bin15m,
      |  make_timestamp(epoch_us(TIMESTAMP '2024-01-01 00:00:00')
      |    + ((epoch_us(CAST(ts AS TIMESTAMP))
      |        - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 3600000000)
      |      * 3600000000) AS bin1h
      |FROM events WHERE event_id < 2000
      |ORDER BY event_id""".stripMargin

  // -- conditional / misc ---------------------------------------------------
  private val fnConditional: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem.filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_suppkey"),
        Fx.coalesce(Fx.nullif(col("l_discount"), lit(0.0)), lit(-1.0))
          .as("coalesce_v"),
        Fx.nullif(col("l_returnflag"), lit("N")).as("nullif_v"),
        Fx.nullif(col("l_discount"), lit(0.0)).isNull.as("isnull_v"),
        Fx.in_list(col("l_returnflag"), Seq("A", "R")).as("in_v"),
        Fx.in_list(col("l_returnflag"), Seq("A", "R"), negated = true)
          .as("notin_v"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 40, "mid")
          .otherwise("high").as("case_v"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
               col("l_extendedprice"), col("l_suppkey"))
  }
  private val fnConditionalSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  l_suppkey,
      |  coalesce(nullif(l_discount, 0.0), -1.0) AS coalesce_v,
      |  nullif(l_returnflag, 'N') AS nullif_v,
      |  nullif(l_discount, 0.0) IS NULL AS isnull_v,
      |  l_returnflag IN ('A','R') AS in_v,
      |  l_returnflag NOT IN ('A','R') AS notin_v,
      |  CASE WHEN l_quantity < 10 THEN 'low'
      |       WHEN l_quantity < 40 THEN 'mid' ELSE 'high' END AS case_v
      |FROM lineitem WHERE l_orderkey < 300
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  l_suppkey""".stripMargin

  // -- cast battery (reference expression.rs:129-137) -----------------------
  private val fnCast: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer.filter(col("c_custkey") < 200)
      .select(col("c_custkey"),
        col("c_custkey").cast("string").as("int2str"),
        Fx.split_part(col("c_name"), "#", 2).cast("long").as("str2long"),
        col("c_custkey").cast("double").as("long2dbl"),
        col("c_nationkey").cast("long").as("int2long"),
        floor(col("c_acctbal")).cast("long").as("dbl2long"),
        col("c_acctbal").cast("string").as("dbl2str"))
      .orderBy(col("c_custkey"))
  }
  private val fnCastSql =
    """SELECT c_custkey,
      |  CAST(c_custkey AS VARCHAR) AS int2str,
      |  CAST(split_part(c_name, '#', 2) AS BIGINT) AS str2long,
      |  CAST(c_custkey AS DOUBLE) AS long2dbl,
      |  CAST(c_nationkey AS BIGINT) AS int2long,
      |  CAST(floor(c_acctbal) AS BIGINT) AS dbl2long,
      |  CAST(c_acctbal AS VARCHAR) AS dbl2str
      |FROM customer WHERE c_custkey < 200
      |ORDER BY c_custkey""".stripMargin

  // -- expression operators: arithmetic / comparison / boolean (§2.9) -------
  private val exprOps: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem.filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        (col("l_quantity") + col("l_tax")).as("add_v"),
        (col("l_quantity") - col("l_discount")).as("sub_v"),
        (col("l_quantity") * col("l_extendedprice")).as("mul_v"),
        (col("l_extendedprice") / col("l_quantity")).as("div_v"),
        (col("l_partkey") % lit(7L)).as("mod_v"),
        (col("l_quantity") < 25.0).as("lt_v"),
        (col("l_quantity") <= 25.0).as("le_v"),
        (col("l_quantity") === 25.0).as("eq_v"),
        (col("l_quantity") =!= 25.0).as("ne_v"),
        (col("l_quantity") > 25.0).as("gt_v"),
        (col("l_quantity") >= 25.0).as("ge_v"),
        (col("l_quantity") > 10.0 && col("l_discount") > 0.02).as("and_v"),
        (col("l_quantity") > 45.0 || col("l_discount") > 0.08).as("or_v"),
        (!(col("l_quantity") > 25.0)).as("not_v"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
               col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
  }
  private val exprOpsSql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      |  l_extendedprice,
      |  l_quantity + l_tax AS add_v,
      |  l_quantity - l_discount AS sub_v,
      |  l_quantity * l_extendedprice AS mul_v,
      |  l_extendedprice / l_quantity AS div_v,
      |  l_partkey % 7 AS mod_v,
      |  l_quantity < 25.0 AS lt_v,
      |  l_quantity <= 25.0 AS le_v,
      |  l_quantity = 25.0 AS eq_v,
      |  l_quantity <> 25.0 AS ne_v,
      |  l_quantity > 25.0 AS gt_v,
      |  l_quantity >= 25.0 AS ge_v,
      |  l_quantity > 10.0 AND l_discount > 0.02 AS and_v,
      |  l_quantity > 45.0 OR l_discount > 0.08 AS or_v,
      |  NOT (l_quantity > 25.0) AS not_v
      |FROM lineitem WHERE l_orderkey < 300
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      |  l_extendedprice""".stripMargin

  // -- arrays (make_array + element access, §2.8/§2.9) ----------------------
  // Array cells can't survive the driver's pandas hash-compare, so the array
  // ops are gated through two serializations that keep them fully under
  // test: an integer-element array '|'-joined (bigint→string renders
  // identically in Spark and DuckDB; double→string does not), and the
  // double-element array checked by element extraction back to scalar
  // doubles (bit-exact through parquet on both sides).
  private val fnArray: Q = (s, dir) => {
    val t = Tables(s, dir)
    val darr = Fx.make_array(col("l_quantity"), col("l_tax"), col("l_discount"))
    t.lineitem.filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        array_join(transform(Fx.make_array(col("l_orderkey"),
          col("l_partkey"), col("l_suppkey")), _.cast("string")), "|")
          .as("arri_v"),
        element_at(darr, 1).as("arr_q"),
        element_at(darr, 3).as("arr_d"),
        element_at(Fx.make_array(col("l_quantity"), col("l_tax")), 2)
          .as("elem_v"),
        size(Fx.make_array(col("l_quantity"), col("l_tax"))).as("size_v"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
               col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
  }
  private val fnArraySql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      |  l_extendedprice,
      |  array_to_string([l_orderkey, l_partkey, l_suppkey], '|') AS arri_v,
      |  [l_quantity, l_tax, l_discount][1] AS arr_q,
      |  [l_quantity, l_tax, l_discount][3] AS arr_d,
      |  [l_quantity, l_tax][2] AS elem_v,
      |  CAST(len([l_quantity, l_tax]) AS INT) AS size_v
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      |  l_extendedprice""".stripMargin

  // -- wider array battery: distinct / sort / contains / slice / union /
  //    intersect / max-min, serialized through the hash gate (the driver
  //    cannot compare array cells). DuckDB's list_distinct does not
  //    guarantee order, so set-valued results sort before serializing on
  //    BOTH engines. ------------------------------------------------------
  private val fnArray2: Q = (s, dir) => {
    val t = Tables(s, dir)
    val arr = array(pmod(col("o_orderkey"), lit(5)),
      pmod(col("o_orderkey"), lit(3)), pmod(col("o_orderkey"), lit(5)))
    val arr2 = array(pmod(col("o_orderkey"), lit(3)),
      pmod(col("o_orderkey"), lit(7)))
    t.orders.filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        array_join(sort_array(array_distinct(arr)), ",").as("dist_s"),
        array_join(sort_array(arr), ",").as("sort_s"),
        array_contains(arr, lit(2L)).as("has2"),
        array_join(slice(sort_array(arr), 1, 2), ",").as("first2"),
        array_join(sort_array(array_union(arr, arr2)), ",").as("union_s"),
        array_join(sort_array(array_intersect(arr, arr2)), ",")
          .as("inter_s"),
        array_max(arr).as("mx"), array_min(arr).as("mn"))
      .orderBy(col("o_orderkey"))
  }
  private val fnArray2Sql =
    """WITH a AS (SELECT o_orderkey,
      |    [o_orderkey % 5, o_orderkey % 3, o_orderkey % 5] AS arr,
      |    [o_orderkey % 3, o_orderkey % 7] AS arr2
      |  FROM orders WHERE o_orderkey < 2000)
      |SELECT o_orderkey,
      |  array_to_string(list_sort(list_distinct(arr)), ',') AS dist_s,
      |  array_to_string(list_sort(arr), ',') AS sort_s,
      |  list_contains(arr, 2) AS has2,
      |  array_to_string(list_slice(list_sort(arr), 1, 2), ',') AS first2,
      |  array_to_string(list_sort(list_distinct(arr || arr2)), ',')
      |    AS union_s,
      |  array_to_string(list_sort(list_distinct(list_filter(arr,
      |    x -> list_contains(arr2, x)))), ',') AS inter_s,
      |  list_max(arr) AS mx, list_min(arr) AS mn
      |FROM a ORDER BY o_orderkey""".stripMargin

  def defs: Map[String, Q] = Map(
    "op_fn_math" -> fnMath,
    "op_fn_trunc" -> fnTrunc,
    "op_fn_string" -> fnString,
    "op_fn_regex" -> fnRegex,
    "op_fn_hash" -> fnHash,
    "op_fn_hash_sha2" -> fnHashSha2,
    "op_fn_datetime" -> fnDatetime,
    "op_fn_datetime_events" -> fnDatetimeEvents,
    "op_fn_conditional" -> fnConditional,
    "op_fn_cast" -> fnCast,
    "op_expr_ops" -> exprOps,
    "op_fn_array" -> fnArray,
    "op_fn_array2" -> fnArray2)

  def oracle: Map[String, String] = Map(
    "op_fn_math" -> fnMathSql,
    "op_fn_trunc" -> fnTruncSql,
    "op_fn_string" -> fnStringSql,
    "op_fn_regex" -> fnRegexSql,
    "op_fn_hash" -> fnHashSql,
    // op_fn_hash_sha2: rows-only (DuckDB lacks sha224/384/512)
    "op_fn_datetime" -> fnDatetimeSql,
    "op_fn_datetime_events" -> fnDatetimeEventsSql,
    "op_fn_conditional" -> fnConditionalSql,
    "op_fn_cast" -> fnCastSql,
    "op_expr_ops" -> exprOpsSql,
    "op_fn_array" -> fnArraySql,
    "op_fn_array2" -> fnArray2Sql)
}
