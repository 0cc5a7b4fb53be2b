package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher — the blocklist/dictionary gate
  * of a pretraining curation pipeline (C4's badword filter, PII term
  * lists, compliance blocklists) as ONE automaton pass per document.
  *
  * The naive form is `terms.map(t => contains(text, t))` — O(terms)
  * scans per row, and a 1 000-term list turns every document read into
  * a thousand substring searches. The automaton form is O(bytes) per
  * row regardless of dictionary size: the dictionary is compiled ONCE
  * on the driver into a dense goto-complete DFA (failure links folded
  * into the transition table, dictionary-suffix hits folded into
  * per-state output lists), rides the expression as a reference object
  * (serialized once per task, NOT per row), and each row is a single
  * `state = next[state << 8 | byte]` walk. Matching is over raw UTF-8
  * bytes — exact byte-sequence match equals exact string match because
  * UTF-8 is self-synchronizing, and it is what the DuckDB oracle's
  * `contains`/`replace` compute too.
  *
  * Memory: the dense table is `states × 256` ints — ~1 KB of automaton
  * per dictionary byte (the C4 badword list, ~400 terms, is ~4 MB; fine
  * to ship in a task binary). For 100 k+-term gazetteers a banded/
  * double-array layout would be the next step; dense-first keeps the
  * per-byte inner loop branch-free, which is what the 100 TB scan pays
  * for.
  */
object AhoCorasick {

  /** Compiled DFA. `next` is the flattened `states × 256` transition
    * table (goto-complete: failure transitions are pre-resolved, the
    * walk never consults a failure link). `stateTerms(s)` lists the
    * ids of every dictionary term ending at state `s`, INCLUDING terms
    * that end at a proper dictionary-suffix of `s`'s path (the output
    * closure), so one lookup per byte sees every match ending there.
    */
  final class Automaton(
      val next: Array[Int],
      val stateTerms: Array[Array[Int]],
      val numTerms: Int) extends Serializable {
    def numStates: Int = next.length / 256
  }

  /** Compile a dictionary. Terms must be non-empty and distinct; term
    * id = position in `terms` (spec'd stable so per-term hit
    * attribution is deterministic).
    */
  def compile(terms: Seq[String]): Automaton = {
    require(terms.nonEmpty, "blocklist dictionary must be non-empty")
    require(terms.forall(_.nonEmpty), "blocklist terms must be non-empty")
    require(terms.distinct.size == terms.size, "blocklist terms must be distinct")

    // trie with dense per-state child tables (-1 = absent)
    val children = ArrayBuffer(Array.fill(256)(-1))
    val ends = ArrayBuffer(ArrayBuffer.empty[Int])
    terms.zipWithIndex.foreach { case (term, id) =>
      var s = 0
      term.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
        val c = b & 0xff
        if (children(s)(c) < 0) {
          children(s)(c) = children.length
          children += Array.fill(256)(-1)
          ends += ArrayBuffer.empty[Int]
        }
        s = children(s)(c)
      }
      ends(s) += id
    }

    // BFS: failure links + output closure + goto completion in place.
    // Parents are finalized before children, so reading
    // `children(fail)(c)` already sees a completed (DFA) row.
    val n = children.length
    val fail = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val child = children(0)(c)
      if (child < 0) children(0)(c) = 0
      else { fail(child) = 0; queue += child }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      ends(s) ++= ends(fail(s)) // output closure (fail(s) already closed)
      (0 until 256).foreach { c =>
        val child = children(s)(c)
        if (child < 0) children(s)(c) = children(fail(s))(c)
        else { fail(child) = children(fail(s))(c); queue += child }
      }
    }

    val flat = new Array[Int](n * 256)
    var i = 0
    while (i < n) {
      System.arraycopy(children(i), 0, flat, i * 256, 256)
      i += 1
    }
    new Automaton(flat, ends.map(_.toArray).toArray, terms.size)
  }

  /** One DFA walk: (total hits incl. overlaps, distinct terms matched).
    * Null text is data (a document with no matches), not a null result.
    */
  def matchEval(text: UTF8String, ac: Automaton): InternalRow = {
    if (text == null) return InternalRow(0L, 0L)
    val bytes = text.getBytes
    val next = ac.next
    val stateTerms = ac.stateTerms
    val seen = new Array[Boolean](ac.numTerms)
    var hits = 0L
    var distinct = 0L
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = next((s << 8) | (bytes(i) & 0xff))
      val terms = stateTerms(s)
      if (terms.length != 0) {
        hits += terms.length
        var j = 0
        while (j < terms.length) {
          val t = terms(j)
          if (!seen(t)) { seen(t) = true; distinct += 1L }
          j += 1
        }
      }
      i += 1
    }
    InternalRow(hits, distinct)
  }
}

/** text -> struct(n_hits, n_terms): total occurrences (every match end
  * position — overlapping and nested matches all count) and distinct
  * dictionary terms present. The automaton rides as a reference object;
  * the generated code is one static call, so the match stays inside
  * whole-stage codegen.
  */
case class AcMatchStats(text: Expression, ac: AhoCorasick.Automaton)
    extends UnaryExpression {

  override def child: Expression = text
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_terms", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = text.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ac match requires a string column, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any =
    AhoCorasick.matchEval(text.eval(input).asInstanceOf[UTF8String], ac)

  // null text is handled inside the evaluator (zero-match row)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AhoCorasick.Automaton].getName)
    val childGen = text.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      $javaType ${ev.value} = graft.plans.AhoCorasick.matchEval(
        ${childGen.isNull} ? null : ${childGen.value}, $acRef);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(text = c)
}
