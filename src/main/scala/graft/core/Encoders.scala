package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Encoder / scaler operators (SURVEY §2.9 E1–E4). */
object Encoders {

  /** E1 — label-encoding dictionary: dense integer codes over the sorted
    * distinct values (sklearn `LabelEncoder` semantics, which
    * `My_LabelEncoder` extends — `utils/my_encoders.py:11-105`); null maps
    * to -1 like the reference's NaN rule (`my_encoders.py:62-66`).
    *
    * Returns the (value, code) dictionary. The ranking window runs on the
    * DISTINCT set — bounded by the column's cardinality, not the table
    * (the reference builds the same dict driver-side; a dictionary that
    * doesn't fit one task is not a categorical column). */
  def labelDictionary(df: DataFrame, colName: String): DataFrame = {
    val distinct = df.select(col(colName)).na.drop().distinct()
    val w = Window.orderBy(col(colName))
    distinct.withColumn("code", (row_number().over(w) - 1).cast("int"))
  }

  /** E1 — apply label encoding: broadcast-join the dictionary; unseen
    * values (at transform time) get code = maxCode + rank among the
    * unseen values — the reference's grow-on-unseen rule
    * (`my_encoders.py:74-78`) made deterministic; nulls get -1. The
    * unseen-dictionary build is one distinct + anti-join (bounded by the
    * column's cardinality, like the dictionary itself). */
  def labelEncode(df: DataFrame, colName: String, dict: DataFrame,
                  outCol: String): DataFrame = {
    val full = grownDictionary(df, colName, dict)
      .withColumnRenamed(dict.columns.head, colName)
      .withColumnRenamed("code", "__dict_code")
    df.join(broadcast(full), Seq(colName), "left")
      .withColumn(outCol,
        when(col(colName).isNull, lit(-1)).otherwise(col("__dict_code")))
      .drop("__dict_code")
  }

  /** E1 — the dictionary AFTER a grow-on-unseen transform over `df`: the
    * fitted dict plus (value → maxCode + rank) rows for `df`'s unseen
    * values — exactly the state the reference's `transform` leaves in
    * `self.transformer`/`self.inverse_transformer`
    * (`my_encoders.py:74-78`). Same (value, code) schema as the input
    * dict; bounded by the column's cardinality. Feed this to
    * [[labelDecode]] to recover grown labels the way the reference's
    * `inverse_transform` does. */
  def grownDictionary(df: DataFrame, colName: String,
                      dict: DataFrame): DataFrame = {
    val valueName = dict.columns.head
    val d = dict.select(col(valueName), col("code").cast("int").as("code"))
    val maxCode = d.agg(max(col("code"))).head() match {
      case r if r.isNullAt(0) => -1
      case r => r.getInt(0)
    }
    val unseen = df.select(col(colName).as(valueName)).na.drop().distinct()
      .join(d.select(col(valueName)), Seq(valueName), "left_anti")
      .withColumn("code",
        (row_number().over(Window.orderBy(col(valueName))) + maxCode).cast("int"))
    d.unionByName(unseen)
  }

  /** E1 — inverse label encoding (`My_LabelEncoder.inverse_transform`,
    * `utils/my_encoders.py:97-105`): map integer codes back to their
    * labels through a dictionary. The reference decodes via pandas
    * `.map(inverse_transformer)` where `inverse_transformer` includes
    * every grown-on-unseen code inserted at transform time
    * (`my_encoders.py:77`) — to reproduce that, pass
    * [[grownDictionary]](encodeData, colName, dict) as `dict`; grown
    * codes then recover their labels. Passing the bare fitted dict
    * instead decodes only fit-time codes, and codes it never saw
    * (including the null code -1) hit pandas' missing-key rule → null.
    * Broadcast join on the bounded dictionary; the corpus never
    * shuffles. */
  def labelDecode(df: DataFrame, codeCol: String, dict: DataFrame,
                  outCol: String): DataFrame = {
    val valueName = dict.columns.head
    val d = dict.select(col("code").cast("int").as("__dec_code"),
                        col(valueName).as(outCol))
    df.join(broadcast(d), col(codeCol).cast("int") === col("__dec_code"), "left")
      .drop("__dec_code")
  }

  /** E4 — the reference's three scaler choices
    * (`ml_models.py:82-91,488-492`) as per-series window columns:
    * standard ((x−μ)/σ), min-max ((x−min)/(max−min)), max-abs (x/max|x|).
    * One partitioned window, no collect — scales across series. */
  def scaled(df: DataFrame, valueCol: String,
             seriesCols: Seq[String] = Nil): DataFrame = {
    val w = if (seriesCols.isEmpty) Window.partitionBy()
            else Window.partitionBy(seriesCols.map(col): _*)
    val v = col(valueCol)
    df.withColumn(s"${valueCol}_std",
        (v - avg(v).over(w)) / stddev_samp(v).over(w))
      .withColumn(s"${valueCol}_minmax",
        (v - min(v).over(w)) / (max(v).over(w) - min(v).over(w)))
      .withColumn(s"${valueCol}_maxabs", v / max(abs(v)).over(w))
  }

  /** Robust scaling ((x − median)/IQR) — sklearn RobustScaler: the
    * outlier-immune fourth member of the [[scaled]] family (a whale
    * row moves μ/σ/min/max arbitrarily, but not the quartiles). Exact
    * per-group quartiles broadcast back ([[graft.stats.Quantiles]]
    * winsorize shape — swap in the approx path at 100 TB); the corpus
    * itself never shuffles. A zero-IQR group (over half its mass on
    * one value) emits null rather than ±Infinity. */
  def robustScaled(df: DataFrame, valueCol: String,
                   groupCols: Seq[String] = Nil): DataFrame = {
    val q = graft.stats.Quantiles.exact(df, valueCol, groupCols,
      Seq(0.25, 0.5, 0.75))
    val bounds = q.select(groupCols.map(col) :+ col("q25").as("__q25") :+
      col("q50").as("__q50") :+ col("q75").as("__q75"): _*)
    val joined = if (groupCols.isEmpty) df.crossJoin(broadcast(bounds))
                 else df.join(broadcast(bounds), groupCols)
    joined
      .withColumn(s"${valueCol}_robust",
        when(col("__q75") > col("__q25"),
          (col(valueCol).cast("double") - col("__q50"))
            / (col("__q75") - col("__q25"))))
      .drop("__q25", "__q50", "__q75")
  }

  /** Out-of-fold target (mean) encoding with m-estimate smoothing — the
    * high-cardinality categorical encoder AutoML stacks pair with label
    * encoding (E1): each row's category becomes the target mean of the
    * OTHER folds, shrunk toward the global prior,
    *   enc = ((S_cat − S_cat,fold) + m·prior) / ((N_cat − N_cat,fold) + m)
    * so a row never sees its own fold's targets (the leave-fold-out
    * discipline that stops target leakage — Micci-Barreca 2001). Folds
    * are `idCol % folds` (the sm1 deterministic-mod rule; swap in a
    * hash-fence upstream if ids correlate with the target).
    *
    * Determinism: targets quantize to the 1e-6 grid and every S is an
    * exact BIGINT; enc is then a fixed double expression over exact
    * inputs. A category entirely inside one fold degrades to the prior
    * (denominator = m) rather than NaN.
    *
    * Shape: ONE aggregate on (cat, fold) — a |cats|·folds-row table —
    * from which per-cat totals and the global prior derive without
    * touching the corpus again; the encode join back is BROADCAST LEFT
    * (bounded by |cats|·folds), so the corpus itself never shuffles and
    * the row count is PRESERVED: a null category or null id can never
    * equi-match, so those rows coalesce to the global prior instead of
    * silently dropping. Appends `<cat>_te` and `__fold`. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   idCol: String, folds: Int = 5,
                   smoothing: Double = 20.0): DataFrame = {
    require(folds >= 2, s"need folds >= 2, got $folds")
    require(smoothing > 0, s"need smoothing > 0, got $smoothing")
    val y6 = floor(col(targetCol).cast("double") * 1e6 + 0.5).cast("long")
    val cellAgg = df
      .withColumn("__fold", pmod(col(idCol).cast("long"), lit(folds)).cast("int"))
      .groupBy(col(catCol), col("__fold"))
      .agg(sum(y6).as("s6"), count(lit(1)).as("cn"))
    val catAgg = cellAgg.groupBy(col(catCol))
      .agg(sum(col("s6")).as("cs6"), sum(col("cn")).as("ccn"))
    val prior = cellAgg.groupBy()
      .agg((sum(col("s6")) / 1e6 / sum(col("cn"))).as("__prior"))
    val enc = cellAgg.join(catAgg, Seq(catCol)).crossJoin(broadcast(prior))
      .select(col(catCol), col("__fold"),
        (((col("cs6") - col("s6")) / 1e6 + lit(smoothing) * col("__prior")) /
         ((col("ccn") - col("cn")).cast("double") + lit(smoothing)))
          .as(s"${catCol}_te"))
    df.withColumn("__fold", pmod(col(idCol).cast("long"), lit(folds)).cast("int"))
      .join(broadcast(enc), Seq(catCol, "__fold"), "left")
      .crossJoin(broadcast(prior))
      .withColumn(s"${catCol}_te", coalesce(col(s"${catCol}_te"), col("__prior")))
      .drop("__prior")
  }

  /** Hashing-trick encoder (the sklearn `FeatureHasher` / VW hashing
    * shape): each categorical value maps to a bucket in [0, `buckets`)
    * via the first 16 bits of md5("col=value"), with a ±1 sign from the
    * next hex digit's parity so colliding features cancel in expectation
    * rather than pile up (Weinberger et al. 2009, §3). Unlike
    * [[labelDictionary]]/[[labelEncode]] there is NO vocabulary state:
    * the encoding is a pure map-side expression — nothing to fit, ship,
    * or grow on unseen values — which is the whole point at 100 TB
    * (a billion-key dictionary join vs zero shuffle). Null values get a
    * null bucket/sign (the E1 missing-key discipline). Appends
    * `<col>_fh` and `<col>_fsign` per input column; md5 keeps it
    * engine-portable (DuckDB: ('0x'||substr(md5(...),1,4))::BIGINT). */
  def featureHash(df: DataFrame, cols: Seq[String], buckets: Int): DataFrame = {
    require(cols.nonEmpty, "need at least one column to hash")
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    cols.foldLeft(df) { (d, c) =>
      val h = md5(concat(lit(c + "="), col(c).cast("string")))
      d.withColumn(s"${c}_fh",
          when(col(c).isNotNull,
            conv(substring(h, 1, 4), 16, 10).cast("long") % buckets))
        .withColumn(s"${c}_fsign",
          when(col(c).isNotNull,
            (conv(substring(h, 5, 1), 16, 10).cast("long") % 2L) * 2L - 1L))
    }
  }

  /** Frequency (count) encoding — the zero-leakage workhorse between
    * label codes and target encoding: each category becomes its corpus
    * count and its frequency share. Exact-integer counts, the ratio one
    * double division; nulls encode as the null-group count (a real
    * category, the pandas `value_counts(dropna=False)` stance). 100-TB
    * shape: one groupBy on the category (the reduced |categories| table
    * broadcasts back), the corpus never moves. */
  def frequencyEncode(df: DataFrame, catCol: String): DataFrame = {
    val counts = df.groupBy(col(catCol))
      .agg(count(lit(1)).as(s"${catCol}_count"))
      .withColumnRenamed(catCol, "__cat")
    // total from the reduced table, IN-PLAN (no eager count() action —
    // the targetEncode prior discipline); the join is NULL-SAFE so the
    // null category carries its own count
    val total = counts.groupBy().agg(sum(col(s"${catCol}_count")).as("__total"))
    df.join(broadcast(counts), col(catCol) <=> col("__cat"), "left")
      .crossJoin(broadcast(total))
      .withColumn(s"${catCol}_freq",
        col(s"${catCol}_count").cast("double") / col("__total"))
      .drop("__cat", "__total")
  }

  /** Weight-of-evidence encoding — the scorecard-standard supervised
    * encoder for a BINARY target (Siddiqi 2006, "Credit Risk
    * Scorecards" §6): each category becomes
    *   WoE = ln( (pos_i + s)/(POS + s·K) / ((neg_i + s)/(NEG + s·K)) )
    * with Laplace smoothing s so empty cells stay finite. Unlike target
    * encoding's posterior mean, WoE is symmetric in the classes and
    * additive in the log-odds — the natural feature for the logistic
    * models the quality-classifier path fits.
    *
    * Same 100-TB shape as [[frequencyEncode]]: one groupBy on the
    * category, the |categories|-row table broadcasts back with its
    * totals, the corpus never moves. Counts are exact integers; the
    * single ln() runs on identical doubles in both engines. */
  def woeEncode(df: DataFrame, catCol: String, targetCol: String,
                smoothing: Double = 0.5): DataFrame = {
    require(smoothing > 0, s"need smoothing > 0, got $smoothing")
    val counts = df.groupBy(col(catCol))
      .agg(sum(when(col(targetCol), 1L).otherwise(0L)).as("__pos"),
           sum(when(col(targetCol), 0L).otherwise(1L)).as("__neg"))
      .withColumnRenamed(catCol, "__cat")
    val tot = counts.groupBy()
      .agg(sum(col("__pos")).as("__tpos"), sum(col("__neg")).as("__tneg"),
           count(lit(1)).as("__k"))
    df.join(broadcast(counts), col(catCol) <=> col("__cat"), "left")
      .crossJoin(broadcast(tot))
      .withColumn(s"${catCol}_woe",
        log(((col("__pos") + smoothing) / (col("__tpos") + lit(smoothing) * col("__k")))
          / ((col("__neg") + smoothing) / (col("__tneg") + lit(smoothing) * col("__k")))))
      .withColumn(s"${catCol}_pos", col("__pos"))
      .withColumn(s"${catCol}_neg", col("__neg"))
      .drop("__cat", "__pos", "__neg", "__tpos", "__tneg", "__k")
  }

  /** Equal-frequency (quantile) binning — the sklearn
    * KBinsDiscretizer(strategy='quantile') analogue, with EXACT edges
    * where MLlib's QuantileDiscretizer uses approximate ones: cut
    * `valueCol` at the b−1 interior percentiles, assign bin = 1 +
    * #{edges strictly below the value}, and report each bin's
    * (count, min, max). Boundary convention differs from Bucketizer:
    * a value exactly equal to an interior edge falls in the LOWER bin
    * here (closed-upper intervals), while Bucketizer's splits are
    * left-inclusive [a, b) and would send it up. Duplicate edges from
    * low-cardinality data leave the skipped bin ids absent (no
    * zero-count rows are emitted).
    *
    * 100-TB shape: the edge table is ONE exact-percentile aggregation
    * (the [[graft.stats.Quantiles]] oracle path — swap in
    * `Quantiles.approx` at scale, same contract as winsorize), b−1
    * numbers broadcast back as literals folded into a map-side
    * expression; the corpus shuffles once for the final per-bin reduce.
    * Determinism: both engines interpolate percentiles with the same
    * lower+(higher−lower)·frac rule (the a23_gaps parity), and bin
    * assignment compares identical doubles. */
  def quantileBin(df: DataFrame, valueCol: String, b: Int): DataFrame = {
    require(b >= 2, s"need at least 2 bins, got $b")
    val probs = (1 until b).map(_.toDouble / b)
    val edges = graft.stats.Quantiles.exact(df, valueCol, Nil, probs)
      .drop("n")
    val edgeCols = probs.map(p =>
      col(graft.stats.Quantiles.qLabelPublic(p)))
    val bin = edgeCols.foldLeft(lit(1L)) { (acc, e) =>
      acc + when(col(valueCol) > e, 1L).otherwise(0L)
    }
    df.crossJoin(broadcast(edges))
      .withColumn("bin", bin)
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("cnt"),
           min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }
}
