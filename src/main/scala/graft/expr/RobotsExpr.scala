package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by eval and generated code (and documented
  * for oracles): robots.txt rules per RFC 9309 via
  * [[graft.ops.Robots]], serialized as array<string> of
  * "A&lt;pattern&gt;"/"D&lt;pattern&gt;" entries. */
object RobotsKernel {
  def rules(content: UTF8String, agent: String): ArrayData = {
    val rs = graft.ops.Robots.rulesFor(content.toString, agent)
    new GenericArrayData(rs.map(UTF8String.fromString(_)))
  }

  def allowed(rules: ArrayData, path: UTF8String): Boolean = {
    val n = rules.numElements()
    val arr = new Array[String](n)
    var i = 0
    while (i < n) { arr(i) = rules.getUTF8String(i).toString; i += 1 }
    graft.ops.Robots.allowed(arr, path.toString)
  }
}

/** robots.txt body → the rules applicable to `agent` (codegen'd):
  * parse once per robots ROW, not once per URL. */
case class RobotsRules(child: Expression, agent: String) extends UnaryExpression {
  require(agent != null && agent.nonEmpty, "robots_rules: agent required")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    RobotsKernel.rules(input.asInstanceOf[UTF8String], agent)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.expr.RobotsKernel.rules($c, $agentRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): RobotsRules =
    copy(child = newChild)
  override def prettyName: String = "robots_rules"
}

object RobotsRules {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(content: Column, agent: String): Column =
    column(new RobotsRules(expression(content), agent))
}

/** (rules array, path) → RFC 9309 §2.2.2 longest-match verdict
  * (codegen'd scan-speed probe, the BloomMightContain shape). */
case class RobotsAllowed(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(rules: Any, path: Any): Any =
    RobotsKernel.allowed(rules.asInstanceOf[ArrayData], path.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, p) => s"graft.expr.RobotsKernel.allowed($r, $p)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): RobotsAllowed =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "robots_allowed"
}

object RobotsAllowed {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(rules: Column, path: Column): Column =
    column(new RobotsAllowed(expression(rules), expression(path)))
}
