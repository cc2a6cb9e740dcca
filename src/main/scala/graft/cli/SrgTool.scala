package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future, ExecutionContext}
import scala.concurrent.duration.Duration
import graft.cells.CellDomain
import graft.grid.GridSpec
import graft.operators.{Surrogate, PostOps}
import graft.io.Smoke

/** The Java SurrogateTool meta-pipeline (SurrogateTool.java:33;
  * SA_ch05_surrogate.md:94-138) as a library driver: a catalog of surrogate
  * specs runs CONCURRENTLY on the Spark scheduler (the reference forks one
  * srgcreate process per core — here each spec is a job submitted from its
  * own thread; fair scheduling interleaves them), then merge / gapfill /
  * normalize / QA post-passes, SMOKE files and an SRGDESC index. */
object SrgTool {

  sealed trait WeightKind
  case object PointW extends WeightKind
  case object LineW extends WeightKind
  case object PolyW extends WeightKind

  /** One generation row of the tool's surrogate-specification CSV. */
  final case class SrgSpec(code: Int, name: String, kind: WeightKind,
                           weights: DataFrame, weightAttr: Option[String] = None)

  final case class MergeSpec(outCode: Int, name: String,
                             a: Int, fa: Double, b: Int, fb: Double)
  /** `A;B;…` concatenation merge (SA_ch05_surrogate.md:440-450): union of
    * the referenced surrogate tables under the output code. */
  final case class ConcatSpec(outCode: Int, name: String, parts: Seq[Int])
  final case class GapfillSpec(outCode: Int, name: String, cascade: Seq[Int])

  final case class Result(srg: Map[Int, DataFrame], qaSummary: DataFrame,
                          qaNot1: DataFrame, srgdesc: Seq[(Int, String, String)])

  /** Run the whole catalog. Returns per-code surrogate tables + QA reports;
    * writes SMOKE text + SRGDESC when outDir is given. */
  def run(spark: SparkSession, counties: DataFrame, grid: GridSpec,
          domain: CellDomain, res: Int,
          specs: Seq[SrgSpec],
          merges: Seq[MergeSpec] = Nil,
          gapfills: Seq[GapfillSpec] = Nil,
          normalizeTol: Double = 1e-6,
          outDir: Option[String] = None,
          concats: Seq[ConcatSpec] = Nil,
          denomThreshold: Double = 1e-5,
          proj: Smoke.ProjInfo = Smoke.ProjInfo()): Result = {

    // generation: one Spark job chain per spec, submitted concurrently.
    // keepSkipped: below-threshold counties ride along so the SMOKE sink
    // can render their #SKIPPED rows (surrogate.c:434-452); post-passes
    // and Result.srg see only live counties (the reference's downstream
    // tools parse the text files and skip '#' comment lines)
    implicit val ec: ExecutionContext = ExecutionContext.global
    val generatedFull: Map[Int, DataFrame] = Await.result(
      Future.traverse(specs) { s =>
        Future {
          val df = s.kind match {
            case PointW => Surrogate.pointSurrogate(s.weights, counties,
              grid, domain, res, s.code, s.weightAttr, denomThreshold,
              keepSkipped = true)
            case LineW => Surrogate.lineSurrogate(s.weights, counties,
              grid, domain, res, s.code, s.weightAttr, denomThreshold,
              keepSkipped = true)
            case PolyW => Surrogate.polySurrogate(s.weights, counties,
              grid, domain, res, s.code, s.weightAttr, denomThreshold,
              keepSkipped = true)
          }
          s.code -> df
        }
      }, Duration.Inf).toMap
    val generated: Map[Int, DataFrame] = generatedFull.map { case (c, df) =>
      c -> df.where(col("denom") >= denomThreshold)
    }
    val skippedRows: Map[Int, DataFrame] = generatedFull.map { case (c, df) =>
      c -> df.where(col("denom") < denomThreshold)
    }

    // a post-pass referencing a surrogate that wasn't generated (e.g. its
    // generation row says GENERATE=NO) must fail naming the spec, not as a
    // bare 'key not found: <code>'
    def resolve(pool: Map[Int, DataFrame], code: Int, kind: String,
                spec: String): DataFrame =
      pool.getOrElse(code, throw new IllegalArgumentException(
        s"$kind '$spec' references surrogate code $code, which was not " +
          s"generated (available: ${pool.keys.toSeq.sorted.mkString(", ")})"))

    // post-passes over generated tables
    val merged = merges.map { m =>
      m.outCode -> PostOps.merge(
        resolve(generated, m.a, "merge", m.name),
        resolve(generated, m.b, "merge", m.name), m.fa, m.fb, m.outCode)
    }.toMap
    val concatenated = concats.map { c =>
      c.outCode -> c.parts.map(resolve(generated, _, "concat", c.name))
        .reduce(_ unionByName _)
        .withColumn("srg_code", lit(c.outCode))
    }.toMap
    val all0 = generated ++ merged ++ concatenated
    val filled = gapfills.map { g =>
      g.outCode -> PostOps.gapfill(
        g.cascade.map(resolve(all0, _, "gapfill", g.name)), g.outCode)
    }.toMap
    val all = all0 ++ filled

    val normalized = all.map { case (code, df) =>
      code -> PostOps.normalize(df, normalizeTol)
    }

    // QA over every table that has frac
    val union = normalized.values
      .map(_.select("srg_code", "fips", "col", "row", "frac"))
      .reduce(_ unionByName _)
    val qaSum = PostOps.qaSummary(union)
    val qaNot1 = PostOps.qaNot1(union)

    // sinks: SMOKE per code + SRGDESC index (SA_ch05_surrogate.md:688)
    val descRows = outDir.map { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      normalized.toSeq.sortBy(_._1).map { case (code, df) =>
        val name = specs.find(_.code == code).map(_.name)
          .orElse(merges.find(_.outCode == code).map(_.name))
          .orElse(concats.find(_.outCode == code).map(_.name))
          .orElse(gapfills.find(_.outCode == code).map(_.name))
          .getOrElse(s"srg_$code")
        val path = s"$dir/srg_$code.txt"
        // gapfilled/merged tables may lack QA fields — write plain rows then
        // (the reference's no-QA output mode, surrogate.c:476-519)
        val hasQa = Seq("numer", "denom", "qasum").forall(df.columns.contains)
        val full = if (hasQa) df else df
          .withColumn("numer", lit(0.0)).withColumn("denom", lit(1.0))
          .withColumn("qasum", lit(0.0))
        // generated codes append their below-threshold counties so the
        // file carries the reference's #SKIPPED rows (un-normalized: the
        // reference skips those counties before normalization too)
        val sinkDf = skippedRows.get(code)
          .map(sk => full.unionByName(sk)).getOrElse(full)
        Smoke.write(sinkDf, grid, proj, path, withQa = hasQa,
          denomThreshold = denomThreshold)
        (code, name, path)
      }
    }.getOrElse(normalized.keys.toSeq.sorted.map(c => (c, s"srg_$c", "")))

    outDir.foreach { dir =>
      val lines = "#SRGDESC" +: descRows.map { case (c, n, p) => s"$c,$n,$p" }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/SRGDESC.txt"),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    }

    // release the per-surrogate cached intermediates (W∩D fragments,
    // per-cell matrices) — a catalog run generates many; without this the
    // cached DISK blocks accumulate for the whole session. Returned
    // DataFrames stay valid (they recompute if re-used after the drain).
    if (outDir.isDefined) graft.spark.PersistTracker.drain()

    Result(normalized, qaSum, qaNot1, descRows)
  }
}
