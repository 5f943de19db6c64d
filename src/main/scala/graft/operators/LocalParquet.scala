package graft.operators

/** Driver-local read of a SMALL, FLAT parquet dimension (r18 optimization,
  * guide §1.2): a type-bounded lookup like c21's 25-row nation map was paid
  * for with a full Spark job round-trip (schedule + task launch + collect,
  * ~30-40 ms) on EVERY query execution. For a dimension that is read in its
  * entirety onto the driver anyway, reading the parquet file directly is
  * the same I/O without the job.
  *
  * NO caching anywhere — every call re-opens and re-reads the files, so a
  * bench/oracle invocation always computes from the parquet inputs.
  * Supports the flat primitive types the testdata dims use (INT32, INT64,
  * DOUBLE, FLOAT, BINARY/UTF8); anything nested or repeated throws — this
  * is a dimension fast path, not a scan replacement.
  */
object LocalParquet {

  /** Read `columns` from a parquet file or directory-of-part-files;
    * returns one Array[Any] per row (Int/Long/Double/Float/String or null
    * slots, in `columns` order).
    */
  def readAll(path: String, columns: Seq[String]): Seq[Array[Any]] = {
    val f = new java.io.File(path)
    require(f.exists(), s"no such parquet path: $path")
    val files =
      if (f.isFile) Seq(f)
      else f.listFiles.filter(x => x.isFile && x.getName.endsWith(".parquet"))
        .sortBy(_.getName).toSeq
    files.flatMap(readFile(_, columns))
  }

  private def readFile(file: java.io.File, columns: Seq[String]): Seq[Array[Any]] = {
    import org.apache.parquet.example.data.Group
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.ColumnIOFactory
    import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

    val conf = new org.apache.hadoop.conf.Configuration()
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toURI), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      columns.foreach { c =>
        require(schema.containsField(c), s"column $c missing in $file")
        val t = schema.getType(schema.getFieldIndex(c))
        require(t.isPrimitive && t.getRepetition !=
          org.apache.parquet.schema.Type.Repetition.REPEATED,
          s"column $c is not a flat primitive in $file")
      }
      val out = Seq.newBuilder[Array[Any]]
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val rows = pages.getRowCount
        val io = new ColumnIOFactory().getColumnIO(schema)
        val recordReader = io.getRecordReader(pages, new GroupRecordConverter(schema))
        var r = 0L
        while (r < rows) {
          val g: Group = recordReader.read()
          val row = new Array[Any](columns.size)
          var i = 0
          while (i < columns.size) {
            val c = columns(i)
            val idx = schema.getFieldIndex(c)
            row(i) =
              if (g.getFieldRepetitionCount(idx) == 0) null
              else schema.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
                case INT32 => g.getInteger(idx, 0)
                case INT64 => g.getLong(idx, 0)
                case DOUBLE => g.getDouble(idx, 0)
                case FLOAT => g.getFloat(idx, 0)
                case BINARY => g.getString(idx, 0)
                case other =>
                  throw new IllegalArgumentException(
                    s"unsupported primitive $other for column $c")
              }
            i += 1
          }
          out += row
          r += 1
        }
        pages = reader.readNextRowGroup()
      }
      out.result()
    } finally reader.close()
  }
}
