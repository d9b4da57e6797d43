package graft.functions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Java bridge to Spark's internal Column/Expression converters. The Scala
 * signatures are private[sql]; the compiled statics are public, and javac
 * sees only the bytecode.
 */
public final class ColumnBridge {
  private ColumnBridge() {}

  public static Column column(Expression e) {
    return org.apache.spark.sql.classic.ExpressionUtils.column(e);
  }

  public static Expression expression(Column c) {
    return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
  }
}
