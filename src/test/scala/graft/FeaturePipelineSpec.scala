package graft

import org.apache.spark.ml.feature._
import org.apache.spark.ml.linalg.{SparseVector, Vector}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** MLlib feature-engineering surface (SURVEY E5's Tokenizer/StopWordsRemover/
  * CountVectorizer/IDF/NGram row, plus the one-hot label encoding the
  * reference's DataVec iterators produce implicitly).
  */
class FeaturePipelineSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private def docs = Tables.documents(spark, sfDir).limit(100)
    .select(col("doc_id"), col("text"))

  test("E5: tokenizer -> stopwords -> CountVectorizer -> IDF pipeline") {
    val tokenized = new RegexTokenizer().setInputCol("text").setOutputCol("raw")
      .setPattern("[^a-z0-9]+").setToLowercase(true).transform(docs)
    val filtered = new StopWordsRemover().setInputCol("raw").setOutputCol("tokens")
      .transform(tokenized)
    // stopwords really removed
    val leaked = filtered.select(explode(col("tokens")).as("t"))
      .where(col("t").isin("the", "a", "of", "and")).count()
    assert(leaked == 0)

    val cvModel = new CountVectorizer().setInputCol("tokens").setOutputCol("tf")
      .setMinDF(2).fit(filtered)
    assert(cvModel.vocabulary.length > 10)
    val tf = cvModel.transform(filtered)

    val idfModel = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tf)
    val out = idfModel.transform(tf)
    val v = out.select("tfidf").head().getAs[Vector](0)
    assert(v.size == cvModel.vocabulary.length)
    // ubiquitous tokens get near-zero idf; rare ones get higher weight
    val idf = idfModel.idf.toArray
    assert(idf.min >= 0.0 && idf.max > idf.min)
  }

  test("E5: NGram produces (n-1)-fewer bigrams and pairs adjacent tokens") {
    val df = Seq(Seq("fast", "key", "order", "sort")).toDF("tokens")
    val grams = new NGram().setN(2).setInputCol("tokens").setOutputCol("bigrams")
      .transform(df).select("bigrams").as[Seq[String]].head()
    assert(grams == Seq("fast key", "key order", "order sort"))
  }

  test("one-hot labels: StringIndexer + OneHotEncoder round-trip") {
    val data = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    val indexer = new StringIndexer().setInputCol("c_mktsegment").setOutputCol("idx")
      .setStringOrderType("alphabetAsc").fit(data)
    assert(indexer.labels.length == 5)
    assert(indexer.labels.sorted.sameElements(indexer.labels)) // alphabetical
    val encoded = new OneHotEncoder().setInputCol("idx").setOutputCol("onehot")
      .setDropLast(false).fit(indexer.transform(data))
      .transform(indexer.transform(data))
    val row = encoded.where(col("c_mktsegment") === indexer.labels.head)
      .select("onehot").head().getAs[SparseVector](0)
    assert(row.size == 5 && row.indices.toSeq == Seq(0) && row.values.toSeq == Seq(1.0))
  }
}
