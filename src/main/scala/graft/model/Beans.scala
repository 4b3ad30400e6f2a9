package graft.model

/** Typed layer: the reference's eight entity beans, kept field-for-field
  * (SURVEY §1.1; /root/reference SparkSreaming_realtime bean sources)
  * as `Dataset[T]` element types. Money stays Double and timestamps stay
  * epoch-millis Long / formatted String for behavioral parity (SURVEY
  * §1.2, §7.4 risk 4).
  */

/** bean/PageLog.scala:3-19 — page view with common device fields. */
case class PageLog(
    mid: String, user_id: String, province_id: String, channel: String,
    is_new: String, model: String, operate_system: String,
    version_code: String, brand: String,
    page_id: String, last_page_id: String, page_item: String,
    page_item_type: String, sourceType: String,
    during_time: Long, ts: Long)

/** bean/PageDisplayLog.scala:3-24 — page fields + one exposure. */
case class PageDisplayLog(
    mid: String, user_id: String, province_id: String, channel: String,
    is_new: String, model: String, operate_system: String,
    version_code: String, brand: String,
    page_id: String, last_page_id: String, page_item: String,
    page_item_type: String, sourceType: String, during_time: Long,
    display_type: String, display_item: String, display_item_type: String,
    display_order: String, display_pos_id: String, ts: Long)

/** bean/PageActionLog.scala:3-24 — page fields + one action. */
case class PageActionLog(
    mid: String, user_id: String, province_id: String, channel: String,
    is_new: String, model: String, operate_system: String,
    version_code: String, brand: String,
    page_id: String, last_page_id: String, page_item: String,
    page_item_type: String, sourceType: String, during_time: Long,
    action_id: String, action_item: String, action_item_type: String,
    action_ts: Long, ts: Long)

/** bean/StartLog.scala:3-19 — app-start event. */
case class StartLog(
    mid: String, user_id: String, province_id: String, channel: String,
    is_new: String, model: String, operate_system: String,
    version_code: String, brand: String,
    entry: String, open_ad_id: String, loading_time_ms: Long,
    open_ad_ms: Long, open_ad_skip_ms: Long, ts: Long)

/** bean/DauInfo.scala:3-36 — PageLog subset + user/province enrichment. */
case class DauInfo(
    mid: String, user_id: String, province_id: String, channel: String,
    is_new: String, model: String, operate_system: String,
    version_code: String, brand: String,
    user_gender: String, user_age: String,
    province_name: String, province_iso_code: String,
    province_3166_2: String, province_area_code: String,
    dt: String, hr: String, ts: Long)

/** bean/OrderInfo.scala:3-29 — order header, source + derived fields. */
case class OrderInfo(
    id: Long, province_id: Long, order_status: String, user_id: Long,
    total_amount: Double, activity_reduce_amount: Double,
    coupon_reduce_amount: Double, original_total_amount: Double,
    feight_fee: Double, feight_fee_reduce: Double, expire_time: String,
    refundable_time: String, create_time: String, operate_time: String,
    create_date: String, create_hour: String,
    province_name: String, province_area_code: String,
    province_3166_2: String, province_iso_code: String,
    user_age: Int, user_gender: String)

/** bean/OrderDetail.scala:3-14 — order line; split_* default 0D. */
case class OrderDetail(
    id: Long, order_id: Long, sku_id: Long, order_price: Double,
    sku_num: Long, sku_name: String, create_time: String,
    split_total_amount: Double = 0d, split_activity_amount: Double = 0d,
    split_coupon_amount: Double = 0d)

/** bean/OrderWide.scala:5-39 — union of OrderInfo + OrderDetail
  * (order_id = info.id, detail_id = detail.id). */
case class OrderWide(
    order_id: Long, detail_id: Long, province_id: Long,
    order_status: String, user_id: Long,
    total_amount: Double, sku_id: Long, order_price: Double,
    sku_num: Long, sku_name: String, split_total_amount: Double,
    create_date: String, create_hour: String,
    province_name: String, province_area_code: String,
    province_3166_2: String, province_iso_code: String,
    user_age: Int, user_gender: String)
