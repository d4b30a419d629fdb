package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Session-free `$"col"` interpolator for query definitions (the
  * spark.implicits._ one needs a live session; queries are declared
  * statically). */
package object queries {
  implicit class ColInterp(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
