package graft.functions

import graft.ops.{Psl, PslRules}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable domain of a lowercased host under a Public Suffix List
  * (publicsuffix.org semantics: exception rules prevail, else most
  * labels, else the implicit `*`; null when the host IS a public
  * suffix). The rule set rides the expression as a reference object —
  * Catalyst serializes it to every executor ONCE per plan, the
  * broadcast-dimension shape — and resolution is O(labels) hash probes
  * inside whole-stage codegen, so the lookup adds no shuffle and no
  * interpreted-row boundary to gate queries (x94, the streaming
  * domain-gate monitor) that run it per document.
  */
case class RegistrableDomainPsl(child: Expression, rules: PslRules)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  // Null even for non-null hosts: a host that IS a public suffix (or
  // a 1-label host under the default rule) has no registrable domain.
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.PslCode.registrable(input.asInstanceOf[UTF8String], rules)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rulesRef = ctx.addReferenceObj("pslRules", rules, classOf[PslRules].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.ops.PslCode.registrable($c, $rulesRef);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomainPsl =
    copy(child = newChild)
}

object UrlExprs {
  /** PSL-backed registrable domain (the default embedded snapshot). */
  def registrableDomain(host: Column): Column =
    registrableDomain(host, Psl.default)

  /** PSL-backed registrable domain under an explicit rule set (the
    * full publicsuffix.org file parses into one via [[Psl.parse]]).
    */
  def registrableDomain(host: Column, rules: PslRules): Column =
    ColumnBridge.column(RegistrableDomainPsl(ColumnBridge.expression(host), rules))
}
