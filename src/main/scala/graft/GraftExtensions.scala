package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Standard cluster installation entry point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the graft optimizer rules (bbox row-group pruning, automatic
  * spatial-join routing) and the native expression surface at SESSION
  * CONSTRUCTION — the only hook available on deployments where user code
  * cannot run before the session exists (Thrift/SQL gateways, notebook
  * services, Spark Connect servers). `Graft.prepare(spark)` remains the
  * programmatic equivalent and additionally registers the scalar-UDF
  * surface (st_area and friends) that has no native Expression form;
  * both paths are idempotent and compose.
  *
  * Injected rules land in Catalyst's user-provided-optimizer batch — the
  * same post-pruning slot `experimental.extraOptimizations` uses, so plan
  * shape is identical whichever installation path is taken (asserted in
  * GraftExtensionsSpec).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.SpatialFilterRule)
    ext.injectOptimizerRule(_ => graft.plans.SpatialJoinRule)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {

  private def fd(name: String, arity: Int, clazz: Class[_])(
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name),
      es => {
        if (es.length != arity)
          throw new IllegalArgumentException(
            s"$name expects $arity argument(s), got ${es.length}")
        build(es)
      })

  import graft.functions._

  /** The native expression surface (same names and builders as the
    * per-object `register` methods Graft.prepare drives).
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fd("st_x", 1, classOf[StX])(es => StX(es.head)),
    fd("st_y", 1, classOf[StY])(es => StY(es.head)),
    fd("st_point", 2, classOf[StMakePoint])(es => StMakePoint(es(0), es(1))),
    fd("st_envelope_native", 1, classOf[StEnvelope])(es => StEnvelope(es.head)),
    fd("st_intersects", 2, classOf[StIntersectsExpr])(es => StIntersectsExpr(es(0), es(1))),
    fd("st_disjoint", 2, classOf[StDisjointExpr])(es => StDisjointExpr(es(0), es(1))),
    fd("st_contains", 2, classOf[StContainsExpr])(es => StContainsExpr(es(0), es(1))),
    fd("st_within", 2, classOf[StWithinExpr])(es => StWithinExpr(es(0), es(1))),
    fd("st_distance", 2, classOf[StDistanceExpr])(es => StDistanceExpr(es(0), es(1))),
    fd("st_dwithin", 3, classOf[StDWithinExpr])(es => StDWithinExpr(es(0), es(1), es(2))),
    fd("st_union", 2, classOf[StUnionExpr])(es => StUnionExpr(es(0), es(1))),
    fd("st_intersection", 2, classOf[StIntersectionExpr])(es => StIntersectionExpr(es(0), es(1))),
    fd("st_buffer", 2, classOf[StBufferExpr])(es => StBufferExpr(es(0), es(1))),
    fd("st_convexhull", 1, classOf[StConvexHullExpr])(es => StConvexHullExpr(es.head)),
    fd("st_srid", 1, classOf[StSridExpr])(es => StSridExpr(es.head)),
    fd("st_setsrid", 2, classOf[StSetSridExpr])(es => StSetSridExpr(es(0), es(1))),
    fd("cosine_sim", 2, classOf[CosineSimilarity])(es => CosineSimilarity(es(0), es(1))),
    fd("graft_json_get", 2, classOf[JsonGetScalar])(es => JsonGetScalar(es(0), es(1))),
    fd("pack_ascii8", 1, classOf[PackAscii8])(es => PackAscii8(es.head)),
    fd("pack_upper_ascii8", 1, classOf[PackUpperAscii8])(es => PackUpperAscii8(es.head)),
    fd("char_trigrams", 1, classOf[CharTrigrams])(es => CharTrigrams(es.head)),
    fd("nfc_normalize", 1, classOf[NfcNormalize])(es => NfcNormalize(es.head)),
    fd("strip_accents", 1, classOf[StripAccents])(es => StripAccents(es.head)),
    fd("html_text", 1, classOf[HtmlText])(es => HtmlText(es.head)),
    fd("url_normalize", 1, classOf[UrlNormalizeExpr])(es => UrlNormalizeExpr(es.head)),
    fd("url_resolve", 2, classOf[UrlResolveExpr])(es => UrlResolveExpr(es(0), es(1))),
    fd("html_links", 1, classOf[HtmlLinksExpr])(es => HtmlLinksExpr(es.head)),
    fd("split_sentences", 1, classOf[SentenceSplitExpr])(es => SentenceSplitExpr(es.head)),
    fd("detect_charset", 1, classOf[DetectCharsetExpr])(es => DetectCharsetExpr(es.head)),
    fd("sniff_text", 1, classOf[SniffTextExpr])(es => SniffTextExpr(es.head)),
    fd("html_blocks", 1, classOf[HtmlBlocksExpr])(es => HtmlBlocksExpr(es.head)),
    fd("html_meta", 1, classOf[HtmlMetaExpr])(es => HtmlMetaExpr(es.head)),
    fd("meta_charset", 1, classOf[MetaCharsetExpr])(es => MetaCharsetExpr(es.head)),
    fd("detect_charset_html", 1, classOf[DetectCharsetHtmlExpr])(es => DetectCharsetHtmlExpr(es.head)),
    fd("sniff_text_html", 1, classOf[SniffTextHtmlExpr])(es => SniffTextHtmlExpr(es.head)),
    fd("detect_mime", 1, classOf[DetectMimeExpr])(es => DetectMimeExpr(es.head)),
    fd("html_anchors", 1, classOf[HtmlAnchorsExpr])(es => HtmlAnchorsExpr(es.head)))
}
